package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.89 (round-17 batch 5) — quantile diagnostics on the
  * two-sample grid, both ORDER STATISTICS BY COUNTING (inclusive
  * cumulative counts from [[graft.util.DistRank.globalPrefixSums]];
  * the k-th order statistic is min(x │ cum ≥ k) — never a global
  * sort through one task):
  *
  *  - `agg_qq_deciles`: the nine decile pairs (Q₁(p), Q₂(p)),
  *    p = 0.1..0.9 — the QQ table behind the EDF verdicts
  *    (`agg_ks_test` says WHETHER the distributions differ, the QQ
  *    gaps say WHERE). Lower empirical quantile at rank ⌈p·n⌉, the
  *    threshold exact in integers ((k·n + 9) div 10), values in
  *    dollars.
  *
  *  - `agg_median_ci`: the distribution-free ~95% CI for the pooled
  *    median from the Binomial(n, ½) normal approximation — the
  *    symmetric order-statistic interval [x₍ₗ₎, x₍ᵤ₎] with
  *    l = max(1, floor((n − z·√n)/2)) and u = n + 1 − l, z = 1.959964
  *    (convention documented here and in the oracle — sources vary
  *    on the rounding; this is the conservative symmetric form).
  */
object Composite78 {

  private def grid(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame =
    df.select((money(valueCol) * 100).cast("bigint").as("xc"),
        isGroup1.cast("int").as("i1"))
      .groupBy("xc")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))

  // ---- agg_qq_deciles ---------------------------------------------------

  /** Generic QQ-decile core over (value, group-1 indicator). */
  private[graft] def qqDecilesOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = grid(df, valueCol, isGroup1)
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    val pre = graft.util.DistRank.globalPrefixSums(v,
        Seq("ba" -> col("a"), "bb" -> col("b")), col("xc"))
      .select(col("xc"), (col("ba") + col("a")).as("ca"),
        (col("bb") + col("b")).as("cb"))
      .crossJoin(broadcast(tot))
      .localCheckpoint() // both quantile passes read it
    val ks = v.sparkSession.range(1, 10).select(col("id").as("k"))
    val q1 = pre.crossJoin(broadcast(ks))
      .filter(expr("ca >= (k*n1 + 9) div 10"))
      .groupBy(col("k")).agg(min(col("xc")).as("qa"))
    val q2 = pre.crossJoin(broadcast(ks))
      .filter(expr("cb >= (k*n2 + 9) div 10"))
      .groupBy(col("k")).agg(min(col("xc")).as("qb"))
    q1.join(q2, "k")
      .selectExpr("CAST(k AS BIGINT) AS decile",
        "CAST(qa AS DOUBLE)/100 AS q_group1",
        "CAST(qb AS DOUBLE)/100 AS q_group2",
        "CAST(qa - qb AS DOUBLE)/100 AS gap")
      .orderBy("decile")
  }

  private def qqDeciles(s: SparkSession, dir: String): DataFrame = {
    val p = Composite8.pooled(s, dir)
    qqDecilesOn(p, col("x"), col("i1") === 1)
  }

  private val qqOracle =
    """WITH pooled AS (
      |  SELECT c_acctbal AS x,
      |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
      |  FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
      |v AS (
      |  SELECT CAST(CAST(x AS DECIMAL(15,2))*100 AS BIGINT) AS xc,
      |    CAST(sum(i1) AS BIGINT) AS a,
      |    CAST(sum(1 - i1) AS BIGINT) AS b
      |  FROM pooled GROUP BY 1),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
      |  CAST(sum(b) AS BIGINT) AS n2 FROM v),
      |pre AS (
      |  SELECT xc,
      |    CAST(sum(a) OVER w AS BIGINT) AS ca,
      |    CAST(sum(b) OVER w AS BIGINT) AS cb
      |  FROM v
      |  WINDOW w AS (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ks AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS k),
      |q1 AS (
      |  SELECT k, min(xc) AS qa FROM pre CROSS JOIN ks CROSS JOIN tot
      |  WHERE ca >= (k*n1 + 9) // 10 GROUP BY k),
      |q2 AS (
      |  SELECT k, min(xc) AS qb FROM pre CROSS JOIN ks CROSS JOIN tot
      |  WHERE cb >= (k*n2 + 9) // 10 GROUP BY k)
      |SELECT CAST(q1.k AS BIGINT) AS decile,
      |  CAST(qa AS DOUBLE)/100 AS q_group1,
      |  CAST(qb AS DOUBLE)/100 AS q_group2,
      |  CAST(qa - qb AS DOUBLE)/100 AS gap
      |FROM q1 JOIN q2 ON q1.k = q2.k
      |ORDER BY decile""".stripMargin

  // ---- agg_median_ci ------------------------------------------------------

  private[graft] def medianCiOn(df: DataFrame,
      valueCol: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select((money(valueCol) * 100).cast("bigint").as("xc"))
      .groupBy("xc").agg(count(lit(1)).as("t"))
    val tot = v.agg(sum(col("t")).cast("bigint").as("n"))
      .selectExpr("n",
        // l = max(1, floor((n − z·√n)/2)); u = n + 1 − l (symmetric)
        """greatest(CAST(1 AS BIGINT),
          |  CAST(floor((CAST(n AS DOUBLE)
          |    - 1.959964E0*sqrt(CAST(n AS DOUBLE)))/2.0E0) AS BIGINT))
          |  AS l""".stripMargin)
      .selectExpr("n", "l", "n + 1 - l AS u")
    val pre = graft.util.DistRank
      .globalPrefixSum(v, "below", col("xc"), col("t"))
      .select(col("xc"), (col("below") + col("t")).as("c"))
      .crossJoin(broadcast(tot))
      .localCheckpoint() // three order-statistic picks
    val med = pre.filter(expr("c*2 >= n")).agg(min(col("xc")).as("med"))
    val lo = pre.filter(col("c") >= col("l")).agg(min(col("xc")).as("lo"))
    val hi = pre.filter(col("c") >= col("u")).agg(min(col("xc")).as("hi"))
    med.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .crossJoin(broadcast(tot.select("n")))
      .selectExpr("n",
        "CAST(med AS DOUBLE)/100 AS median",
        "CAST(lo AS DOUBLE)/100 AS ci_lo",
        "CAST(hi AS DOUBLE)/100 AS ci_hi")
  }

  private def medianCi(s: SparkSession, dir: String): DataFrame = {
    val p = Composite8.pooled(s, dir)
    medianCiOn(p, col("x"))
  }

  private val medianCiOracle =
    """WITH pooled AS (
      |  SELECT c_acctbal AS x,
      |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
      |  FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
      |v AS (
      |  SELECT CAST(CAST(x AS DECIMAL(15,2))*100 AS BIGINT) AS xc,
      |    CAST(count(*) AS BIGINT) AS t
      |  FROM pooled GROUP BY 1),
      |tot AS (
      |  SELECT n,
      |    greatest(CAST(1 AS BIGINT),
      |      CAST(floor((CAST(n AS DOUBLE)
      |        - 1.959964E0*sqrt(CAST(n AS DOUBLE)))/2.0E0) AS BIGINT)) AS l
      |  FROM (SELECT CAST(sum(t) AS BIGINT) AS n FROM v)),
      |pre AS (
      |  SELECT xc,
      |    CAST(sum(t) OVER (ORDER BY xc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      |  FROM v),
      |med AS (SELECT min(xc) AS med FROM pre CROSS JOIN tot WHERE c*2 >= n),
      |lo AS (SELECT min(xc) AS lo FROM pre CROSS JOIN tot WHERE c >= l),
      |hi AS (SELECT min(xc) AS hi FROM pre CROSS JOIN tot
      |  WHERE c >= n + 1 - l)
      |SELECT n,
      |  CAST(med AS DOUBLE)/100 AS median,
      |  CAST(lo AS DOUBLE)/100 AS ci_lo,
      |  CAST(hi AS DOUBLE)/100 AS ci_hi
      |FROM med CROSS JOIN lo CROSS JOIN hi CROSS JOIN (SELECT n FROM tot) t""".stripMargin

  // ---- registration ---------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_qq_deciles" -> (qqDeciles _),
    "agg_median_ci" -> (medianCi _)
  )

  val oracle: Map[String, String] = Map(
    "agg_qq_deciles" -> qqOracle,
    "agg_median_ci" -> medianCiOracle
  )
}
