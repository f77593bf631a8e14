package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.23 — round-12 customer-lifecycle operators: RFM
  * quintile segmentation (the classic CRM partition) and the
  * Kaplan–Meier survival curve over customer order-activity
  * lifetimes with end-of-window censoring.
  *
  * Scale shapes: both reduce the fact to a |customers|-sized
  * aggregate first; RFM's three quintile windows and KM's risk-set /
  * product-limit windows run over that aggregate (topk_global
  * class), never the fact. KM's product limit is re-expressed as
  * exp(Σ ln(1−d/n)) — a cumulative-sum window instead of an
  * inherently sequential product.
  *
  * Float determinism: RFM is all integers until the surfaced share;
  * KM's ln/exp are identical-input libm calls over exact-integer
  * ratios, absorbed by 6-dp rounding (the llm_lm_score argument).
  */
object Composite9 {

  // ---- evt_rfm_segmentation ----------------------------------------
  // RFM: per-customer recency (last order date), frequency (order
  // count), monetary (exact decimal revenue), each cut into
  // quintiles by a global ntile over the total (metric, custkey)
  // order; segments report their population and revenue. The
  // highest score 5 = most recent / most frequent / highest spend.
  private def rfmSegmentation(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    // The window input is the per-customer aggregate — |customers|
    // rows, entity-sized (~10^10 at the 100 TB target), so each
    // quintile rides [[graft.util.DistRank.globalNtile]] (range
    // partition → broadcast prefix offsets → per-partition
    // row_number — SQL-ntile-exact, asserted by the
    // `agg_ntile_distributed` oracle): no task ever sees more than
    // one key range. ~1 s/ranking of fixed stage overhead at bench
    // SF (the r17 rank-family trade) in exchange for removing the
    // one-task funnel that dies at target scale. (custkey breaks
    // ties → each sort is the total order the primitive requires.)
    val scored = Seq(
      ("r", Seq(col("last_order"), col("o_custkey"))),
      ("f", Seq(col("freq"), col("o_custkey"))),
      ("m", Seq(col("spend"), col("o_custkey"))))
      .foldLeft(base) { case (df, (name, sort)) =>
        graft.util.DistRank.globalNtile(df, name, 5, sort) }
    scored.groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("string").as("revenue"))
      .orderBy("r", "f", "m")
  }

  private val rfmOracle =
    """WITH base AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY o_custkey),
      |scored AS (
      |  SELECT spend,
      |    ntile(5) OVER (ORDER BY last_order, o_custkey) AS r,
      |    ntile(5) OVER (ORDER BY freq, o_custkey) AS f,
      |    ntile(5) OVER (ORDER BY spend, o_custkey) AS m
      |  FROM base)
      |SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(spend) AS VARCHAR) AS revenue
      |FROM scored GROUP BY r, f, m ORDER BY r, f, m""".stripMargin

  // ---- agg_survival_km ---------------------------------------------
  // Kaplan–Meier survival over customer activity lifetimes: duration
  // = days between first and last order; customers still active in
  // the final 183 days of the corpus are right-CENSORED (their last
  // order is a lower bound, not an endpoint). Risk sets come from a
  // duration-descending cumulative count; the product limit
  // Π(1−dᵢ/nᵢ) is exp(Σ ln(…)) — one ascending cumulative window.
  // Surfaced at event times only (dᵢ>0), the standard KM step
  // points.
  /** Generic Kaplan–Meier core over per-subject (duration, event
    * flag) rows — the [[graft.Graft.kaplanMeier]] facade surface.
    * `eventCol` is 1 for an observed event, 0 for right-censored.
    * Returns the step points (t, n_risk, d, survival) unsorted. */
  private[graft] def kaplanMeierOn(life: DataFrame, durCol: String,
      eventCol: String): DataFrame = {
    val byDur = life.groupBy(col(durCol).as("dur"))
      .agg(count(lit(1)).as("n_all"), sum(col(eventCol)).as("d"))
    val w = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byDur.withColumn("n_risk", sum(col("n_all")).over(w))
    val wAsc = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk
      .withColumn("logs", sum(
        log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
        .over(wAsc))
      .filter(col("d") > 0)
      .select(col("dur").as("t"), col("n_risk"), col("d").cast("bigint").as("d"),
        round(exp(col("logs")), 6).as("survival"))
  }

  private def survivalKm(s: SparkSession, dir: String): DataFrame = {
    val life = load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
        .cast("bigint").as("dur"),
        max(col("o_orderdate")).as("last_order"))
    val horizon = broadcast(load(s, dir, "orders")
      .agg(date_sub(max(col("o_orderdate")).cast("date"), 183).as("cutoff")))
    val flagged = life.crossJoin(horizon)
      .select(col("dur"),
        (col("last_order").cast("date") <= col("cutoff")).cast("int").as("evt"))
    kaplanMeierOn(flagged, "dur", "evt").orderBy("t")
  }

  private val survivalOracle =
    """WITH life AS (
      |  SELECT o_custkey,
      |    CAST(datediff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT)
      |      AS dur,
      |    max(o_orderdate) AS last_order
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT CAST(max(o_orderdate) AS DATE) - 183 AS cutoff FROM orders),
      |flagged AS (
      |  SELECT dur,
      |    CAST(CAST(last_order AS DATE) <= cutoff AS INT) AS evt
      |  FROM life CROSS JOIN h),
      |bydur AS (
      |  SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
      |    CAST(sum(evt) AS BIGINT) AS d
      |  FROM flagged GROUP BY dur),
      |risk AS (
      |  SELECT dur, d,
      |    CAST(sum(n_all) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM bydur),
      |km AS (
      |  SELECT dur, d, n_risk,
      |    sum(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))) OVER (
      |      ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS logs
      |  FROM risk)
      |SELECT dur AS t, n_risk, d, round(exp(logs), 6) AS survival
      |FROM km WHERE d > 0 ORDER BY t""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_rfm_segmentation" -> (rfmSegmentation _),
    "agg_survival_km" -> (survivalKm _)
  )

  val oracle: Map[String, String] = Map(
    "evt_rfm_segmentation" -> rfmOracle,
    "agg_survival_km" -> survivalOracle
  )
}
