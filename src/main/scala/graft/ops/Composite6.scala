package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.20 — round-9 business-analytics operators: revenue
  * concentration (per-nation Gini coefficient), the event-type
  * Markov transition matrix, and the cohort-LTV revenue triangle.
  *
  * Scale shapes: gini is one customer-level aggregate + a per-nation
  * window (partition cardinality = nations, each holding its
  * customer slice); markov is one per-user lag window + a tiny
  * (|types|²) aggregate; cohort-LTV is a customer-level min-month
  * aggregate broadcast back into the order stream. All sums
  * accumulate in DECIMAL (§1.5 rule 2) — never raw doubles.
  */
object Composite6 {

  // ---- agg_gini ----------------------------------------------------
  // Per-nation Gini coefficient of customer order revenue — the
  // inequality measure behind "top-1% of customers" dashboards.
  // Spend per customer accumulates as DECIMAL(18,2) (exact); the
  // rank-weighted identity G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n needs one
  // per-nation window ordered by (spend, custkey) — a total order, so
  // both engines assign identical ranks. Σ(i·xᵢ) stays in exact
  // decimal; the two divisions are pinned doubles under 6-dp
  // rounding (§1.5 rule 7's rounded-score carve-out).
  /** Generic per-group Gini core over one value per entity — the
    * [[graft.Graft.gini]] facade surface. `valueCol` should be an
    * exact type (DECIMAL/integer) so the rank-weighted sums stay
    * exact; `idCol` breaks rank ties into a total order. Returns
    * (groupCol, n, gini) unsorted — the caller layers ordering. */
  private[graft] def giniOn(df: DataFrame, groupCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val ranked = df.withColumn("rn", row_number().over(
      Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        sum(col(valueCol) * col("rn")).as("wsum"))
      .select(col(groupCol), col("n"),
        round(
          lit(2.0) * col("wsum").cast("double") /
            (col("n").cast("double") * col("total").cast("double")) -
            (col("n").cast("double") + 1.0) /
            col("n").cast("double"), 6).as("gini"))
  }

  private def giniRevenue(s: SparkSession, dir: String): DataFrame = {
    val spend = load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    val cust = load(s, dir, "customer")
      .join(broadcast(load(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    giniOn(spend.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
      "n_name", "o_custkey", "spend")
      .withColumnRenamed("n", "n_customers")
      .orderBy("n_name")
  }

  private val giniOracle =
    """WITH spend AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT n_name, spend,
      |    row_number() OVER (PARTITION BY n_name ORDER BY spend, o_custkey) AS rn
      |  FROM spend
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
      |  round(2.0 * CAST(sum(spend * rn) AS DOUBLE) /
      |      (CAST(count(*) AS DOUBLE) * CAST(sum(spend) AS DOUBLE)) -
      |    (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE), 6) AS gini
      |FROM ranked GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---- evt_markov_chain --------------------------------------------
  // First-order Markov transition matrix over the event stream: for
  // each (previous type → next type) pair within a user's timeline,
  // the transition count and row-normalized probability. One shuffle
  // (the per-user lag window over the unique (ts, event_id) order —
  // the evt_inter_arrival discipline), then a |types|²-sized
  // aggregate whose row normalization is a free window over ≤25
  // rows. Probabilities divide exact integers.
  /** Generic first-order transition-matrix core — the
    * [[graft.Graft.markovTransitions]] facade surface. `orderCols`
    * must totally order each entity's timeline. Returns
    * (prev_state, next_state, n, prob) unsorted. */
  private[graft] def markovTransitionsOn(df: DataFrame, entityCol: String,
      orderCols: Seq[String], stateCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(orderCols.map(col): _*)
    df.select((entityCol +: orderCols :+ stateCol).map(col): _*)
      .withColumn("prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col(stateCol).as("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob", round(
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("prev_state")).cast("double"), 6))
  }

  private def markovChain(s: SparkSession, dir: String): DataFrame =
    markovTransitionsOn(load(s, dir, "events"), "user_id",
      Seq("ts", "event_id"), "event_type")
      .withColumnRenamed("prev_state", "prev_type")
      .withColumnRenamed("next_state", "next_type")
      .orderBy("prev_type", "next_type")

  private val markovOracle =
    """WITH seq AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |t AS (
      |  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, next_type)
      |SELECT prev_type, next_type, n,
      |  round(CAST(n AS DOUBLE) /
      |    CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS prob
      |FROM t ORDER BY prev_type, next_type""".stripMargin

  // ---- evt_cohort_ltv ----------------------------------------------
  // The cohort-LTV triangle: customers grouped by first-order month,
  // then revenue and active-customer counts per (cohort month, months
  // since). Month index is the exact integer year·12+month (no
  // engine-specific date diff); the cohort assignment is a
  // customer-level min-aggregate joined back into the order stream
  // (broadcast — the cohort table is |customers|-sized, far below
  // the fact). Revenue accumulates as DECIMAL and surfaces through
  // VARCHAR (the llm_sample_hash discipline: both engines print the
  // scaled-integer digits identically, where a double cast could
  // ulp-diverge).
  private def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    // BIGINT month index on both sides: DuckDB's year()/month() return
    // BIGINT, Spark's INT — without the cast the surfaced dtypes split.
    val m = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
      .cast("bigint")
    val orders = load(s, dir, "orders")
      .select(col("o_custkey"), m.as("m"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val cohort = orders.groupBy(col("o_custkey"))
      .agg(min(col("m")).as("cohort_m"))
    orders.join(broadcast(cohort), "o_custkey")
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("months_since"))
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        sum(col("price")).cast("string").as("revenue"))
      .orderBy("cohort_m", "months_since")
  }

  private val cohortOracle =
    """WITH o AS (
      |  SELECT o_custkey,
      |    year(o_orderdate) * 12 + month(o_orderdate) AS m,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |c AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY o_custkey)
      |SELECT cohort_m, m - cohort_m AS months_since,
      |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
      |  CAST(sum(price) AS VARCHAR) AS revenue
      |FROM o JOIN c USING (o_custkey)
      |GROUP BY cohort_m, months_since
      |ORDER BY cohort_m, months_since""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_gini" -> (giniRevenue _),
    "evt_markov_chain" -> (markovChain _),
    "evt_cohort_ltv" -> (cohortLtv _)
  )

  val oracle: Map[String, String] = Map(
    "agg_gini" -> giniOracle,
    "evt_markov_chain" -> markovOracle,
    "evt_cohort_ltv" -> cohortOracle
  )
}
