package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.63 (round-24 batch 5) — single-outlier testing (the
  * bloom-filter scan row of this batch lives with its family in
  * [[Scans]]):
  *
  *  - [[grubbs]]: Grubbs' extreme-studentized-deviate statistic per
  *    order priority — G = max(x̄ − min, max − x̄)/s with the side
  *    and the extreme value itself. `dq_outlier_fences` counts ALL
  *    Tukey-fence outliers; Grubbs scores THE single most extreme
  *    observation against the normal null (the "is this one point
  *    bad, and which one?" question an on-call engineer asks of a
  *    spiking metric). The t-quantile critical value is left to the
  *    caller (no closed form in either engine) — the row surfaces
  *    the exact statistic and the suspect.
  *
  * Scale shape: one map-side-combining power-sum + extremes
  * aggregate per group (5 groups); broadcast-sized output.
  *
  * Determinism: sums are exact DECIMALs (§1.5 r7 VARCHAR route on
  * the oracle side), extremes are exact decimals cast to double
  * (≤ 2^53, exact on both engines); mean/sd/G assemble once from
  * identical formula text with floor-6-dp.
  */
object Composite47 {

  private val grX = "CAST(o_totalprice AS DECIMAL(15,2))"
  private val grX2 = s"CAST($grX * $grX AS DECIMAL(24,4))"

  private val grAggs = Seq(
    Composite3.countAgg("n"),
    Composite3.sumAgg(grX, "s1"),
    Composite3.sumAgg(grX2, "s2"),
    Composite3.StatAgg("mx", s"CAST(max($grX) AS DOUBLE)",
      s"CAST(max($grX) AS DOUBLE)"),
    Composite3.StatAgg("mn", s"CAST(min($grX) AS DOUBLE)",
      s"CAST(min($grX) AS DOUBLE)"))

  private val grMean = "(s1/n)"
  private val grSd = s"sqrt((s2 - $grMean*s1) / (n - 1))"
  private val grG =
    s"""((CASE WHEN (mx - $grMean) >= ($grMean - mn)
       | THEN mx - $grMean ELSE $grMean - mn END) / nullif($grSd, 0))"""
      .stripMargin

  private val grOut = Seq(
    "CAST(n AS BIGINT) AS n",
    s"floor(($grMean)*1e6 + 0.5)/1e6 AS mean",
    s"floor(($grSd)*1e6 + 0.5)/1e6 AS sd",
    s"floor(($grG)*1e6 + 0.5)/1e6 AS g_stat",
    s"""CASE WHEN (mx - $grMean) >= ($grMean - mn) THEN 'high'
       | ELSE 'low' END AS extreme_side""".stripMargin,
    s"""CASE WHEN (mx - $grMean) >= ($grMean - mn) THEN mx
       | ELSE mn END AS extreme_value""".stripMargin)

  private[graft] def grubbsOn(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(expr(grAggs.head.spark).as(grAggs.head.alias),
        grAggs.tail.map(a => expr(a.spark).as(a.alias)): _*)
      .selectExpr("o_orderpriority" +: grOut: _*)
      .orderBy("o_orderpriority")

  private def grubbs(s: SparkSession, dir: String): DataFrame =
    grubbsOn(load(s, dir, "orders"))

  private def grubbsOracle: String =
    s"""WITH g AS (
       |  SELECT o_orderpriority,
       |    ${grAggs.map(a => s"${a.oracle} AS ${a.alias}").mkString(",\n    ")}
       |  FROM orders GROUP BY 1)
       |SELECT o_orderpriority,
       |  ${grOut.mkString(",\n  ")}
       |FROM g ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_grubbs_test" -> (grubbs _)
  )

  val oracle: Map[String, String] = Map(
    "agg_grubbs_test" -> grubbsOracle
  )
}
