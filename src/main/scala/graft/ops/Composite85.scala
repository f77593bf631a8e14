package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.90 (round-18 batch 5) — the two remaining classics of
  * the two-sample battery:
  *
  *  - `agg_mood_scale_test`: Mood's squared-rank DISPERSION test —
  *    the rank-based scale member the battery lacked (`agg_levene_test`
  *    and `agg_bartlett_test` are moment-based and fragile under
  *    heavy tails; `agg_mann_whitney` is location-only): M =
  *    Σ_{group1}(r̄_i − (N+1)/2)² with midranks. In doubled units
  *    2·(r̄ − (N+1)/2) = 2·below + t − N exactly, so 4M accumulates
  *    as exact DECIMAL products over the SAME (value, a, b) grid +
  *    one `DistRank.globalPrefixSum` pass the MW/KS/CvM/AD family
  *    rides; the normal approximation E[M] = n₁(N²−1)/12,
  *    Var[M] = n₁n₂(N+1)(N²−4)/180 assembles in ONE shared-text z
  *    (ties make the variance the standard approximation —
  *    documented, as for every rank test here).
  *  - `agg_logrank_test`: the two-sample log-rank (Mantel–Cox) test
  *    comparing the AUTOMOBILE vs HOUSEHOLD customer-lifetime
  *    survival curves — THE standard companion of `agg_survival_km`
  *    (KM draws each curve; log-rank decides whether they differ),
  *    with the same end-of-window censoring rule. At each event
  *    time: O₁ += d₁ (exact BIGINT), E₁ += d·n₁ᵣ/n, V +=
  *    (d·n₁ᵣ/n)·(n₂ᵣ/n)·((n−d)/(n−1)) — per-term doubles are
  *    identical on both engines (exact integer inputs, fixed op
  *    order), sums 6-dp-floored (survival-KM class); χ² =
  *    (O₁−E₁)²/V vs the pinned χ²₁ 5% point. Risk sets ride ONE
  *    descending cumulative window over the duration axis — bounded
  *    by the corpus day horizon, the `agg_survival_km` shape.
  */
object Composite85 {

  // ---- agg_mood_scale_test -------------------------------------------
  private val moodZ =
    """((CAST(m4 AS DOUBLE)/4.0E0
      |    - CAST(n1 AS DOUBLE)*(CAST(n1 + n2 AS DOUBLE)*CAST(n1 + n2 AS DOUBLE) - 1.0E0)/12.0E0)
      |  / nullif(sqrt(CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)
      |      *(CAST(n1 + n2 AS DOUBLE) + 1.0E0)
      |      *(CAST(n1 + n2 AS DOUBLE)*CAST(n1 + n2 AS DOUBLE) - 4.0E0)/180.0E0), 0))""".stripMargin
  private val moodSelect = Seq("n1", "n2",
    "CAST(m4 AS DOUBLE)/4.0E0 AS m_stat",
    s"floor(($moodZ)*1e6 + 0.5)/1e6 AS z_stat",
    s"(abs($moodZ) > 1.959964E0) AS reject_equal_scale_5pct")

  /** Generic Mood-scale core over (value, group-1 indicator) — the
    * MW/KS grid + the same prefix-sum pass. */
  private[graft] def moodScaleOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    // 2·(r̄ − (N+1)/2) = 2·below + t − N exactly (midrank identity),
    // so 4·M = Σ a·(2·below + t − N)² is exact end-to-end.
    val m = graft.util.DistRank
      .globalPrefixSum(v, "below", col("x"), col("a") + col("b"))
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST(a AS DECIMAL(38,0))
          | * (2*below + (a + b) - (n1 + n2))
          | * (2*below + (a + b) - (n1 + n2))""".stripMargin).as("term"))
      .agg(sum(col("term")).as("m4"))
    m.crossJoin(broadcast(tot)).selectExpr(moodSelect: _*)
  }

  private def moodScale(s: SparkSession, dir: String): DataFrame =
    moodScaleOn(Composite8.pooled(s, dir), col("x"), col("i1") === 1)

  private val moodOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
       |    CAST(sum(1 - i1) AS BIGINT) AS b
       |  FROM pooled GROUP BY x),
       |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |  CAST(sum(b) AS BIGINT) AS n2 FROM v),
       |p AS (
       |  SELECT a, b,
       |    CAST(sum(a + b) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - (a + b) AS below
       |  FROM v),
       |m AS (
       |  SELECT sum(CAST(a AS DECIMAL(38,0))
       |    * (2*below + (a + b) - ((SELECT n1 FROM tot) + (SELECT n2 FROM tot)))
       |    * (2*below + (a + b) - ((SELECT n1 FROM tot) + (SELECT n2 FROM tot)))) AS m4
       |  FROM p)
       |SELECT ${moodSelect.mkString(",\n  ")}
       |FROM m CROSS JOIN tot""".stripMargin

  // ---- agg_logrank_test ----------------------------------------------
  private val lrChi2 =
    """((CAST(o1 AS DOUBLE) - e1)*(CAST(o1 AS DOUBLE) - e1) / nullif(v, 0))"""
  private val lrSelect = Seq("n1", "n2", "n_event_times", "o1",
    "floor(e1*1e6 + 0.5)/1e6 AS e1",
    s"floor(($lrChi2)*1e6 + 0.5)/1e6 AS chi2",
    s"(($lrChi2) > 3.841459E0) AS reject_same_survival_5pct")

  /** Generic two-sample log-rank core over per-subject
    * (duration, event flag, group-1 indicator) rows. */
  private[graft] def logrankOn(life: DataFrame, durCol: String,
      eventCol: String, isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val byDur = life
      .select(col(durCol).as("dur"), col(eventCol).as("evt"),
        isGroup1.cast("int").as("i1"))
      .groupBy(col("dur"))
      .agg(sum(col("i1")).cast("bigint").as("c1"),
        sum(lit(1) - col("i1")).cast("bigint").as("c2"),
        sum(col("evt") * col("i1")).cast("bigint").as("d1"),
        sum(col("evt") * (lit(1) - col("i1"))).cast("bigint").as("d2"))
    // Duration axis = corpus day horizon (the agg_survival_km bound):
    // one descending cumulative window builds both risk sets.
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byDur
      .withColumn("n1r", sum(col("c1")).over(wDesc))
      .withColumn("n2r", sum(col("c2")).over(wDesc))
      .filter(col("d1") + col("d2") > 0)
    val terms = risk.select(
      col("d1"), (col("d1") + col("d2")).as("d"),
      col("n1r"), col("n2r"), (col("n1r") + col("n2r")).as("n"))
      .select(col("d1"),
        expr("CAST(d AS DOUBLE)*CAST(n1r AS DOUBLE)/CAST(n AS DOUBLE)").as("et"),
        expr(
          """(CAST(d AS DOUBLE)*CAST(n1r AS DOUBLE)/CAST(n AS DOUBLE))
            |  * (CAST(n2r AS DOUBLE)/CAST(n AS DOUBLE))
            |  * (CAST(n - d AS DOUBLE)/nullif(CAST(n - 1 AS DOUBLE), 0))""".stripMargin)
          .as("vt"))
    val tot = life.agg(
      sum(isGroup1.cast("int")).cast("bigint").as("n1"),
      sum(lit(1) - isGroup1.cast("int")).cast("bigint").as("n2"))
    terms.agg(count(lit(1)).as("n_event_times"),
        sum(col("d1")).cast("bigint").as("o1"),
        sum(col("et")).as("e1"), sum(col("vt")).as("v"))
      .crossJoin(broadcast(tot))
      .selectExpr(lrSelect: _*)
  }

  private def logrank(s: SparkSession, dir: String): DataFrame = {
    val life = load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
        .cast("bigint").as("dur"),
        max(col("o_orderdate")).as("last_order"))
    val seg = load(s, dir, "customer")
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("c_custkey").as("o_custkey"),
        (col("c_mktsegment") === "AUTOMOBILE").cast("int").as("i1"))
    val horizon = broadcast(load(s, dir, "orders")
      .agg(date_sub(max(col("o_orderdate")).cast("date"), 183).as("cutoff")))
    val flagged = life.join(seg, "o_custkey").crossJoin(horizon)
      .select(col("dur"),
        (col("last_order").cast("date") <= col("cutoff")).cast("int").as("evt"),
        col("i1"))
    logrankOn(flagged, "dur", "evt", col("i1") === 1)
  }

  private val logrankOracle =
    s"""WITH life AS (
       |  SELECT o_custkey,
       |    CAST(datediff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT)
       |      AS dur,
       |    max(o_orderdate) AS last_order
       |  FROM orders GROUP BY o_custkey),
       |seg AS (
       |  SELECT c_custkey AS o_custkey,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |h AS (SELECT CAST(max(o_orderdate) AS DATE) - 183 AS cutoff FROM orders),
       |flagged AS (
       |  SELECT dur,
       |    CAST(CAST(last_order AS DATE) <= cutoff AS INT) AS evt, i1
       |  FROM life JOIN seg USING (o_custkey) CROSS JOIN h),
       |bydur AS (
       |  SELECT dur,
       |    CAST(sum(i1) AS BIGINT) AS c1,
       |    CAST(sum(1 - i1) AS BIGINT) AS c2,
       |    CAST(sum(evt * i1) AS BIGINT) AS d1,
       |    CAST(sum(evt * (1 - i1)) AS BIGINT) AS d2
       |  FROM flagged GROUP BY dur),
       |risk AS (
       |  SELECT d1, d1 + d2 AS d,
       |    CAST(sum(c1) OVER wd AS BIGINT) AS n1r,
       |    CAST(sum(c2) OVER wd AS BIGINT) AS n2r,
       |    CAST(sum(c1) OVER wd AS BIGINT) + CAST(sum(c2) OVER wd AS BIGINT) AS n
       |  FROM bydur
       |  WINDOW wd AS (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |terms AS (
       |  SELECT d1,
       |    CAST(d AS DOUBLE)*CAST(n1r AS DOUBLE)/CAST(n AS DOUBLE) AS et,
       |    (CAST(d AS DOUBLE)*CAST(n1r AS DOUBLE)/CAST(n AS DOUBLE))
       |      * (CAST(n2r AS DOUBLE)/CAST(n AS DOUBLE))
       |      * (CAST(n - d AS DOUBLE)/nullif(CAST(n - 1 AS DOUBLE), 0)) AS vt
       |  FROM risk WHERE d > 0),
       |tot AS (
       |  SELECT CAST(sum(i1) AS BIGINT) AS n1,
       |    CAST(sum(1 - i1) AS BIGINT) AS n2
       |  FROM flagged),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_event_times,
       |    CAST(sum(d1) AS BIGINT) AS o1,
       |    sum(et) AS e1, sum(vt) AS v
       |  FROM terms)
       |SELECT ${lrSelect.mkString(",\n  ")}
       |FROM g CROSS JOIN tot""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mood_scale_test" -> (moodScale _),
    "agg_logrank_test" -> (logrank _)
  )

  val oracle: Map[String, String] = Map(
    "agg_mood_scale_test" -> moodOracle,
    "agg_logrank_test" -> logrankOracle
  )
}
