package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.22 — round-11 nonparametric tests: Mann–Whitney U
  * (rank-sum) and the two-sample Kolmogorov–Smirnov statistic, both
  * over the AUTOMOBILE vs HOUSEHOLD account-balance slices that
  * agg_welch_t already tests parametrically.
  *
  * Both statistics need GLOBAL order statistics of the pooled
  * sample, so each carries one global-order window over the slice
  * (the topk_global single-partition class — the slice is a
  * dimension-table projection, never the fact). Everything that
  * feeds the final statistic is exact: ranks are integers, tied-rank
  * means are exact binary halves (sums of halves are exact in
  * doubles at any accumulation order), and the KS sup-distance is an
  * integer cross-product |c₁·n₂ − c₂·n₁| maximized BEFORE the one
  * double division.
  */
object Composite8 {

  private def pooled(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("c_acctbal").as("x"),
        (col("c_mktsegment") === "AUTOMOBILE").cast("int").as("i1"))

  // ---- agg_mann_whitney --------------------------------------------
  // Mann–Whitney U with tie-corrected normal approximation. Tied
  // ranks use min-rank + (t−1)/2 (exact halves); the tie term
  // Σ(t³−t) folds into the SAME windowed pass as Σ_rows (t²−1) —
  // no second value-group aggregate. The z denominator is the
  // shared-text tie-corrected variance.
  private val mwZ =
    """round((u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
      |    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
      |      (CAST(n1 + n2 + 1 AS DOUBLE) -
      |       CAST(tie AS DOUBLE) /
      |         (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))), 6)""".stripMargin

  private val mwFinal =
    s"""SELECT n1, n2, u1 AS u_stat,
       |  $mwZ
       |    AS z_score
       |FROM m""".stripMargin

  /** Generic Mann–Whitney core over (value, group-1 indicator) — the
    * [[graft.Graft.mannWhitney]] facade surface. Same arithmetic as
    * the oracle text: min-rank + (t−1)/2 tied ranks (exact halves),
    * the tie term folded into the windowed pass, shared z text. */
  private[graft] def mannWhitneyOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .withColumn("rmin", rank().over(Window.orderBy("x")))
      .withColumn("t", count(lit(1)).over(Window.partitionBy("x")))
    r.agg(
      sum(col("i1")).cast("bigint").as("n1"),
      sum(lit(1) - col("i1")).cast("bigint").as("n2"),
      sum(when(col("i1") === 1,
        col("rmin").cast("double") + (col("t").cast("double") - 1.0) / 2.0)
        .otherwise(0.0)).as("rsum"),
      sum(col("t") * col("t") - 1).cast("bigint").as("tie"))
      .selectExpr("n1", "n2",
        "rsum - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0 AS u1",
        "tie")
      .selectExpr("n1", "n2", "u1 AS u_stat", s"$mwZ AS z_score")
  }

  private def mannWhitney(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    mannWhitneyOn(p, col("x"), col("i1") === 1)
  }

  private val mannWhitneyOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |r AS (
       |  SELECT i1,
       |    rank() OVER (ORDER BY x) AS rmin,
       |    count(*) OVER (PARTITION BY x) AS t
       |  FROM pooled),
       |m AS (
       |  SELECT CAST(sum(i1) AS BIGINT) AS n1,
       |    CAST(sum(1 - i1) AS BIGINT) AS n2,
       |    sum(CASE WHEN i1 = 1
       |      THEN CAST(rmin AS DOUBLE) + (CAST(t AS DOUBLE) - 1.0) / 2.0
       |      ELSE 0.0 END) -
       |      CAST(sum(i1) AS DOUBLE) * (CAST(sum(i1) AS DOUBLE) + 1.0) / 2.0
       |      AS u1,
       |    CAST(sum(t * t - 1) AS BIGINT) AS tie
       |  FROM r)
       |$mwFinal""".stripMargin

  // ---- agg_ks_test -------------------------------------------------
  // Two-sample KS: D = sup|F₁−F₂| found as the integer maximum of
  // |c₁·n₂ − c₂·n₁| over the pooled distinct values (cumulative
  // counts via one ordered window over the value groups), divided by
  // n₁·n₂ exactly once. The sup location reports the SMALLEST value
  // attaining it (dmax re-joined, min(x) — arg-max tie behavior is
  // engine-defined, so it is never relied on).
  private val ksFinal =
    """SELECT n1, n2,
      |  round(CAST(dmax AS DOUBLE) /
      |    (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks_d,
      |  x_at
      |FROM (
      |  SELECT max(dmax) AS dmax FROM d) best
      |CROSS JOIN (SELECT n1, n2 FROM tot) t
      |CROSS JOIN (
      |  SELECT min(x) AS x_at FROM d
      |  WHERE dmax = (SELECT max(dmax) FROM d)) loc""".stripMargin

  private val ksCore =
    """v AS (
      |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
      |    CAST(sum(1 - i1) AS BIGINT) AS b
      |  FROM pooled GROUP BY x),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2 FROM v),
      |d AS (
      |  SELECT x,
      |    abs(sum(a) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * (SELECT n2 FROM tot) -
      |        sum(b) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * (SELECT n1 FROM tot)) AS dmax
      |  FROM v)""".stripMargin

  /** Generic two-sample KS core over (value, group-1 indicator) — the
    * [[graft.Graft.ksTest]] facade surface. Same arithmetic as the
    * oracle: the sup distance is the exact integer │c₁·n₂−c₂·n₁│
    * maximized before the one double division; the sup location is
    * the smallest value attaining it. */
  private[graft] def ksTestOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    val wc = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = v
      .select(col("x"), sum(col("a")).over(wc).as("ca"),
        sum(col("b")).over(wc).as("cb"))
      .crossJoin(broadcast(tot))
      .select(col("x"), abs(col("ca") * col("n2") - col("cb") * col("n1")).as("dm"))
    val best = d.agg(max(col("dm")).as("dmax"))
    val loc = d.join(broadcast(best), col("dm") === col("dmax"))
      .agg(min(col("x")).as("x_at"))
    best.crossJoin(tot).crossJoin(loc)
      .selectExpr("n1", "n2",
        "round(CAST(dmax AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks_d",
        "x_at")
  }

  private def ksTest(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    ksTestOn(p, col("x"), col("i1") === 1)
  }

  private val ksOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |$ksCore
       |$ksFinal""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mann_whitney" -> (mannWhitney _),
    "agg_ks_test" -> (ksTest _)
  )

  val oracle: Map[String, String] = Map(
    "agg_mann_whitney" -> mannWhitneyOracle,
    "agg_ks_test" -> ksOracle
  )
}
