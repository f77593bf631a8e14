package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.78 (round-25 batch 11) — paired binary outcomes:
  *
  *  - [[mcnemarTest]]: McNemar's test on the paired binary outcome
  *    "customer's year spend exceeds $500k" across 1996 vs 1997 —
  *    the PAIRED-BINARY corner of the test matrix
  *    (`agg_wilcoxon_signed_rank` / `agg_sign_test` pair continuous
  *    values; `agg_chi_square` crosses INDEPENDENT groups). Only the
  *    discordant pairs carry information: χ² = (b − c)²/(b + c)
  *    against χ²₁ 5% = 3.841459, no continuity correction
  *    (documented, mirrored in the oracle).
  *
  * Scale shape: the customer-year pairing is one customer-keyed
  * conditional aggregate (the Composite52 pairing), then ONE 4-cell
  * global count — no ranks, no windows, no joins.
  *
  * Determinism: cells are exact BIGINTs; χ² assembles once from
  * shared formula text ((b−c)² widened to DOUBLE pre-multiply);
  * the verdict compares the 6-dp-floored statistic.
  */
object Composite62 {

  private val McY1 = 1996
  private val McY2 = 1997
  private val McThresholdCents = 50000000L // $500k year spend

  private val mcChi =
    """((CAST(b AS DOUBLE) - c)*(CAST(b AS DOUBLE) - c)
      | / nullif(CAST(b AS DOUBLE) + c, 0))""".stripMargin
  private val mcChiF = s"floor(($mcChi)*1e6 + 0.5)/1e6"

  private[graft] def mcnemarOn(orders: DataFrame): DataFrame = {
    val yr = year(col("o_orderdate").cast("date"))
    val pairs = orders
      .filter(yr.isin(McY1, McY2))
      .select(col("o_custkey").as("c"), yr.as("y"),
        (money(col("o_totalprice")) * 100).cast("bigint").as("v"))
      .groupBy(col("c"))
      .agg(sum(when(col("y") === McY1, col("v")).otherwise(0L)).as("s1"),
        sum(when(col("y") === McY1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("y") === McY2, col("v")).otherwise(0L)).as("s2"),
        sum(when(col("y") === McY2, 1L).otherwise(0L)).as("c2"))
      .filter(col("c1") > 0 && col("c2") > 0)
      .select((col("s1") > McThresholdCents).as("f1"),
        (col("s2") > McThresholdCents).as("f2"))
    pairs.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(when(col("f1") && !col("f2"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("f1") && col("f2"), 1L).otherwise(0L)).as("c"))
      .selectExpr("n AS n_pairs", "b AS n_high_to_low", "c AS n_low_to_high",
        s"$mcChiF AS mcnemar_chi2",
        s"($mcChiF > 3.841459) AS reject_marginal_homogeneity_5pct")
  }

  private def mcnemarTest(s: SparkSession, dir: String): DataFrame =
    mcnemarOn(load(s, dir, "orders"))

  private val mcnemarOracle =
    s"""WITH o AS (
       |  SELECT o_custkey AS c, year(CAST(o_orderdate AS DATE)) AS y,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS v
       |  FROM orders
       |  WHERE year(CAST(o_orderdate AS DATE)) IN ($McY1, $McY2)),
       |p AS (
       |  SELECT c,
       |    CAST(sum(CASE WHEN y = $McY1 THEN v ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN y = $McY1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN y = $McY2 THEN v ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(sum(CASE WHEN y = $McY2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
       |  FROM o GROUP BY 1),
       |f AS (
       |  SELECT s1 > $McThresholdCents AS f1, s2 > $McThresholdCents AS f2
       |  FROM p WHERE c1 > 0 AND c2 > 0),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN f1 AND NOT f2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS b,
       |    CAST(sum(CASE WHEN NOT f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c
       |  FROM f)
       |SELECT n AS n_pairs, b AS n_high_to_low, c AS n_low_to_high,
       |  $mcChiF AS mcnemar_chi2,
       |  ($mcChiF > 3.841459) AS reject_marginal_homogeneity_5pct
       |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mcnemar_test" -> (mcnemarTest _)
  )

  val oracle: Map[String, String] = Map(
    "agg_mcnemar_test" -> mcnemarOracle
  )
}
