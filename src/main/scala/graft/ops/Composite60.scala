package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.76 (round-25 batch 9) — the ANOVA post-hoc:
  *
  *  - [[tukeyHsd]]: Tukey-Kramer HSD over all 10 priority pairs on
  *    order totals — the step a practitioner runs AFTER
  *    `agg_anova_f` rejects: WHICH groups differ? Studentized range
  *    q = |m_i − m_j| / sqrt(MSE/2·(1/n_i + 1/n_j)) (the Kramer
  *    unequal-n form) against the asymptotic q(5, ∞) 5% critical
  *    3.858 (documented, mirrored in the oracle). Family-wise error
  *    stays at 5% across all 10 comparisons — the property 10
  *    separate Welch t-tests forfeit.
  *
  * Scale shape: ONE map-side-combining conditional aggregate
  * (fixed-order group columns, the anova/bartlett discipline), then
  * a 1-row → 10-row `stack` — no joins, no windows, no data motion
  * after the aggregate.
  *
  * Determinism: per-group Σc, Σc² in exact DECIMAL(38,0) cents
  * (§1.5 r9) with oracle VARCHAR routing (§1.5 r7); MSE and each
  * pair's q assemble once from formula text generated per pair and
  * pasted into both engines; mean_diff surfaces in dollars and the
  * reject flag compares the ALREADY-floored q.
  */
object Composite60 {

  private val ThGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val ThK = ThGroups.size
  // q(k=5, df=∞, α=.05) — Studentized range asymptotic table value.
  private val ThCrit = "3.858"

  private val thN = (0 until ThK).map(i => s"n$i").mkString(" + ")
  // MSE = Σ_i (Σc²_i − (Σc_i)²/n_i) / (N − k), all from the decimal
  // sums (q_i, s_i already double columns).
  private val thMse =
    s"""((${(0 until ThK).map(i =>
        s"(q$i - s$i*s$i/nullif(CAST(n$i AS DOUBLE), 0))").mkString(" + ")})
       | / nullif(CAST(($thN) AS DOUBLE) - $ThK, 0))""".stripMargin

  private def thDiffF(i: Int, j: Int): String =
    s"""floor(((s$i/nullif(CAST(n$i AS DOUBLE), 0)
       | - s$j/nullif(CAST(n$j AS DOUBLE), 0))/100)*1e6 + 0.5)/1e6"""
      .stripMargin
  private def thQF(i: Int, j: Int): String =
    s"""floor((abs(s$i/nullif(CAST(n$i AS DOUBLE), 0)
       | - s$j/nullif(CAST(n$j AS DOUBLE), 0))
       | / nullif(sqrt((mse/2)*(1/nullif(CAST(n$i AS DOUBLE), 0)
       |   + 1/nullif(CAST(n$j AS DOUBLE), 0))), 0))*1e6 + 0.5)/1e6"""
      .stripMargin

  private val thPairs =
    for (i <- 0 until ThK; j <- (i + 1) until ThK) yield (i, j)

  private[graft] def tukeyOn(orders: DataFrame): DataFrame = {
    val c = (money(col("o_totalprice")) * 100).cast("bigint")
    val o = orders.select(col("o_orderpriority").as("g"), c.as("c"))
    val aggs = ThGroups.zipWithIndex.flatMap { case (p, i) => Seq(
      sum(when(col("g") === p, 1L).otherwise(0L)).as(s"n$i"),
      sum(when(col("g") === p, expr("CAST(c AS DECIMAL(19,0))"))
        .otherwise(expr("CAST(0 AS DECIMAL(19,0))")))
        .cast("double").as(s"s$i"),
      sum(when(col("g") === p,
          expr("CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
        .cast("double").as(s"q$i")) }
    val stackArgs = thPairs.map { case (i, j) =>
      s"'${ThGroups(i)}', '${ThGroups(j)}', ${thDiffF(i, j)}, " +
        s"${thQF(i, j)}, (${thQF(i, j)} > $ThCrit)" }.mkString(", ")
    o.groupBy().agg(aggs.head, aggs.tail: _*)
      .withColumn("mse", expr(thMse))
      .selectExpr(s"stack(${thPairs.size}, $stackArgs) AS " +
        "(group_a, group_b, mean_diff, q_stat, reject_pair_5pct)")
      .orderBy("group_a", "group_b")
  }

  private def tukeyHsd(s: SparkSession, dir: String): DataFrame =
    tukeyOn(load(s, dir, "orders"))

  private val tukeyOracle = {
    val aggDefs = ThGroups.zipWithIndex.flatMap { case (p, i) => Seq(
      s"CAST(sum(CASE WHEN g = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS n$i",
      s"""CAST(CAST(sum(CASE WHEN g = '$p' THEN CAST(c AS DECIMAL(19,0))
         |  ELSE CAST(0 AS DECIMAL(19,0)) END) AS VARCHAR) AS DOUBLE)
         |  AS s$i""".stripMargin,
      s"""CAST(CAST(sum(CASE WHEN g = '$p' THEN
         |  CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
         |  ELSE CAST(0 AS DECIMAL(38,0)) END) AS VARCHAR) AS DOUBLE)
         |  AS q$i""".stripMargin)
    }.mkString(",\n    ")
    val branches = thPairs.map { case (i, j) =>
      s"""SELECT '${ThGroups(i)}' AS group_a, '${ThGroups(j)}' AS group_b,
         |  ${thDiffF(i, j)} AS mean_diff,
         |  ${thQF(i, j)} AS q_stat,
         |  (${thQF(i, j)} > $ThCrit) AS reject_pair_5pct
         |FROM m""".stripMargin }.mkString("\nUNION ALL\n")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS c
       |  FROM orders),
       |g AS (
       |  SELECT
       |    $aggDefs
       |  FROM o),
       |m AS (SELECT *, $thMse AS mse FROM g)
       |$branches
       |ORDER BY group_a, group_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_tukey_hsd" -> (tukeyHsd _)
  )

  val oracle: Map[String, String] = Map(
    "agg_tukey_hsd" -> tukeyOracle
  )
}
