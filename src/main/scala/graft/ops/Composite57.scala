package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.73 (round-25 batch 6) — the distribution-free
  * location tests that ask even LESS of the data than the rank
  * family:
  *
  *  - [[signTest]]: the paired sign test on the same per-customer
  *    1996↔1997 spend pairs `agg_wilcoxon_signed_rank` scores
  *    ([[Composite52.pairedDiffs]] — identical pairing, so the two
  *    verdicts are directly comparable): only the SIGN of each
  *    difference counts, making it valid when even the symmetry
  *    assumption behind Wilcoxon fails. Normal approximation
  *    z = (2k − n)/√n, no continuity correction (documented,
  *    mirrored in the oracle).
  *
  *  - [[moodMedianTest]]: Mood's median test across the five order
  *    priorities — classify every order as above/not-above the GRAND
  *    median, then a χ²₄ independence test on the 2×5 table. The
  *    k-group "are the medians equal?" that stays valid under
  *    arbitrary (even different-shaped) group distributions, where
  *    Kruskal-Wallis assumes a common shape.
  *
  * Scale shapes: the sign test is the paired aggregate + ONE global
  * count — no ranks at all. Mood reduces to the DISTINCT cent-value
  * axis for the grand median ([[graft.util.DistRank.globalPrefixSum]]
  * — no single-partition window), broadcasts the ONE-ROW median back
  * into a map-side-combining 2×5 count aggregate, and assembles the
  * χ² from ten exact integers.
  *
  * Determinism: k and n are exact integers; the grand median is the
  * LOWER median (smallest value whose cumulative count reaches
  * ⌈n/2⌉ — an exact integer selection, engine-identical); χ²/z
  * assemble once from shared formula text with CAST-to-DOUBLE
  * pre-multiply; verdicts compare after the 6-dp floor.
  */
object Composite57 {

  // ---- agg_sign_test -----------------------------------------------------
  private val sgZ = "((2*CAST(k AS DOUBLE) - n) / nullif(sqrt(CAST(n AS DOUBLE)), 0))"
  private val sgZF = s"floor(($sgZ)*1e6 + 0.5)/1e6"

  private[graft] def signTestOn(orders: DataFrame): DataFrame =
    Composite52.pairedDiffs(orders)
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("k"))
      .selectExpr("n AS n_pairs", "k AS n_positive",
        s"$sgZF AS z_stat",
        s"(abs($sgZF) > 1.959964) AS reject_no_shift_5pct")

  private def signTest(s: SparkSession, dir: String): DataFrame =
    signTestOn(load(s, dir, "orders"))

  private val signTestOracle =
    s"""${Composite52.pairedDiffsSql},
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM d)
       |SELECT n AS n_pairs, k AS n_positive,
       |  $sgZF AS z_stat,
       |  (abs($sgZF) > 1.959964) AS reject_no_shift_5pct
       |FROM g""".stripMargin

  // ---- agg_mood_median_test ----------------------------------------------
  private val MdGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  // χ² over the 2×5 table from the ten observed counts: row sums
  // ca/cb, column sums a_i + b_i, expected E = row·col/n.
  private val mdChi = {
    val ca = (0 until 5).map(i => s"a$i").mkString(" + ")
    val cb = (0 until 5).map(i => s"b$i").mkString(" + ")
    val terms = (0 until 5).flatMap { i => Seq(
      s"""pow(a$i - CAST(($ca) AS DOUBLE)*(a$i + b$i)/n, 2)
         | / nullif(CAST(($ca) AS DOUBLE)*(a$i + b$i)/n, 0)""".stripMargin,
      s"""pow(b$i - CAST(($cb) AS DOUBLE)*(a$i + b$i)/n, 2)
         | / nullif(CAST(($cb) AS DOUBLE)*(a$i + b$i)/n, 0)""".stripMargin)
    }.mkString("\n + ")
    s"($terms)"
  }
  private val mdChiF = s"floor(($mdChi)*1e6 + 0.5)/1e6"

  private[graft] def moodMedianOn(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_orderpriority").as("g"),
      (money(col("o_totalprice")) * 100).cast("bigint").as("c"))
    val vc = o.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    // lower median: smallest value whose cumulative count reaches
    // ceil(n/2) — exact integer selection on the distinct-value axis.
    // r19: the grand total n rides the prefix-sum pass as a constant
    // column (DistRank totals — exact BIGINT, bit-identical to the
    // separate aggregate), dropping the tot job + crossJoin broadcast
    // (guide §1.2).
    val med = graft.util.DistRank.globalPrefixSumsWithTotals(vc,
        Seq("below" -> col("cnt")), col("c"),
        totals = Seq("n" -> col("cnt")))
      .filter(col("below") + col("cnt") >= expr("(n + 1) div 2"))
      .agg(min(col("c")).as("median_c"))
    val aggs =
      MdGroups.zipWithIndex.flatMap { case (p, i) => Seq(
        sum(when(col("g") === p && col("c") > col("median_c"), 1L)
          .otherwise(0L)).as(s"a$i"),
        sum(when(col("g") === p && col("c") <= col("median_c"), 1L)
          .otherwise(0L)).as(s"b$i")) }
    o.crossJoin(broadcast(med))
      .groupBy().agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(med))
      .withColumn("n",
        expr((0 until 5).map(i => s"a$i + b$i").mkString(" + ")))
      .selectExpr("median_c AS median_cents",
        "CAST(n AS BIGINT) AS n_rows",
        s"$mdChiF AS chi2_stat",
        s"($mdChiF > 9.487729) AS reject_equal_medians_5pct")
  }

  private def moodMedianTest(s: SparkSession, dir: String): DataFrame =
    moodMedianOn(load(s, dir, "orders"))

  private val moodMedianOracle = {
    val aggDefs = MdGroups.zipWithIndex.flatMap { case (p, i) => Seq(
      s"CAST(sum(CASE WHEN g = '$p' AND c > median_c THEN 1 ELSE 0 END) AS BIGINT) AS a$i",
      s"CAST(sum(CASE WHEN g = '$p' AND c <= median_c THEN 1 ELSE 0 END) AS BIGINT) AS b$i")
    }.mkString(",\n    ")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS c
       |  FROM orders),
       |vc AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
       |med AS (
       |  SELECT min(c) AS median_c FROM (
       |    SELECT c,
       |      CAST(sum(cnt) OVER (ORDER BY c
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |        AS cum
       |    FROM vc) CROSS JOIN tot
       |  WHERE cum >= (n + 1) // 2),
       |cells AS (
       |  SELECT
       |    $aggDefs
       |  FROM o CROSS JOIN med),
       |g AS (
       |  SELECT cells.*, med.median_c,
       |    ${(0 until 5).map(i => s"a$i + b$i").mkString(" + ")} AS n
       |  FROM cells CROSS JOIN med)
       |SELECT median_c AS median_cents,
       |  CAST(n AS BIGINT) AS n_rows,
       |  $mdChiF AS chi2_stat,
       |  ($mdChiF > 9.487729) AS reject_equal_medians_5pct
       |FROM g""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_sign_test" -> (signTest _),
    "agg_mood_median_test" -> (moodMedianTest _)
  )

  val oracle: Map[String, String] = Map(
    "agg_sign_test" -> signTestOracle,
    "agg_mood_median_test" -> moodMedianOracle
  )
}
