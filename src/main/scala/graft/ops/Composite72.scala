package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.87 (round-16 batch 2) — stratified association:
  *
  *  - [[mantelHaenszel]]: Mantel-Haenszel pooled odds ratio of the
  *    urgent × high-price 2×2 (the SAME table and $250k threshold as
  *    `agg_odds_ratio` — Composite61.OrThresholdCents is the single
  *    shared definition) STRATIFIED by customer market segment, next
  *    to the crude OR — the "is the association confounded by
  *    segment mix?" read that completes the contingency family
  *    (`agg_odds_ratio` crude, `agg_fisher_exact` small-sample,
  *    `agg_mcnemar_test` paired, `agg_cramers_v` strength,
  *    `agg_simpson_paradox` the sign-reversal audit; MH is the
  *    stratified POOL those rows stop short of). OR_MH =
  *    Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ); crude/MH is surfaced as the
  *    confounding ratio so a segment-mix distortion reads as a
  *    ratio away from 1.
  *
  * Scale shape: one fact scan with the customer dim broadcast, one
  * 5-row stratum aggregate keyed on the 5-value segment alphabet,
  * then the fixed-order 20-column pivot (the agg_anova_f discipline)
  * so both MH sums are ONE expression with a fixed summation order —
  * exact BIGINT cells, bit-identical doubles on both engines, no
  * unordered double SUM anywhere.
  */
object Composite72 {

  private val Segs = Seq(
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  // Per-stratum MH terms in fixed left-assoc order; an EMPTY stratum
  // contributes 0, not NULL — the inner nullif alone would poison
  // the whole fixed-order sum (planted-case finding, Round53Spec).
  private def mhSum(num1: String, num2: String): String =
    Segs.indices.map(i =>
      s"coalesce(CAST($num1$i AS DOUBLE)*$num2$i" +
        s"/nullif(a$i + b$i + c$i + d$i, 0), CAST(0 AS DOUBLE))")
      .mkString("(", " + ", ")")

  private def cellSum(cell: String): String =
    Segs.indices.map(i => s"$cell$i").mkString("(", " + ", ")")

  private val mhOr = s"(${mhSum("a", "d")} / nullif(${mhSum("b", "c")}, 0))"
  private val crudeOr =
    s"""((CAST(${cellSum("a")} AS DOUBLE)*${cellSum("d")})
       | / nullif(CAST(${cellSum("b")} AS DOUBLE)*${cellSum("c")}, 0))"""
      .stripMargin

  private[graft] def mantelHaenszelOn(orders: DataFrame,
      customer: DataFrame): DataFrame = {
    val urgent = col("o_orderpriority") === "1-URGENT"
    val high = (money(col("o_totalprice")) * 100).cast("bigint") >
      Composite61.OrThresholdCents
    val strata = orders
      .select(col("o_custkey"), urgent.as("u"), high.as("h"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(when(col("u") && col("h"), 1L).otherwise(0L)).as("a"),
        sum(when(col("u") && !col("h"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("u") && col("h"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("u") && !col("h"), 1L).otherwise(0L)).as("d"))
    val pivots = Segs.zipWithIndex.flatMap { case (seg, i) =>
      Seq("a", "b", "c", "d").map(cell =>
        sum(when(col("c_mktsegment") === seg, col(cell)).otherwise(0L))
          .as(s"$cell$i")) }
    strata.groupBy().agg(pivots.head, pivots.tail: _*)
      .selectExpr(
        s"CAST(${cellSum("a")} AS BIGINT) AS n_urgent_high",
        s"CAST(${cellSum("b")} AS BIGINT) AS n_urgent_low",
        s"CAST(${cellSum("c")} AS BIGINT) AS n_other_high",
        s"CAST(${cellSum("d")} AS BIGINT) AS n_other_low",
        s"floor(($crudeOr)*1e6 + 0.5)/1e6 AS crude_or",
        s"floor(($mhOr)*1e6 + 0.5)/1e6 AS or_mh",
        s"floor(($crudeOr / nullif($mhOr, 0))*1e6 + 0.5)/1e6" +
          " AS confounding_ratio")
  }

  private def mantelHaenszel(s: SparkSession, dir: String): DataFrame =
    mantelHaenszelOn(load(s, dir, "orders"), load(s, dir, "customer"))

  private val mantelHaenszelOracle = {
    val cells = Segs.zipWithIndex.flatMap { case (seg, i) =>
      Seq("a", "b", "c", "d").map(cell =>
        s"CAST(sum(CASE WHEN c_mktsegment = '$seg' THEN $cell ELSE 0 END)" +
          s" AS BIGINT) AS $cell$i") }
      .mkString(",\n    ")
    s"""WITH o AS (
       |  SELECT o_custkey,
       |    o_orderpriority = '1-URGENT' AS u,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT)
       |      > ${Composite61.OrThresholdCents} AS h
       |  FROM orders),
       |strata AS (
       |  SELECT c_mktsegment,
       |    CAST(sum(CASE WHEN u AND h THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN u AND NOT h THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN NOT u AND h THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN NOT u AND NOT h THEN 1 ELSE 0 END) AS BIGINT)
       |      AS d
       |  FROM o JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1),
       |p AS (
       |  SELECT
       |    $cells
       |  FROM strata)
       |SELECT
       |  CAST(${cellSum("a")} AS BIGINT) AS n_urgent_high,
       |  CAST(${cellSum("b")} AS BIGINT) AS n_urgent_low,
       |  CAST(${cellSum("c")} AS BIGINT) AS n_other_high,
       |  CAST(${cellSum("d")} AS BIGINT) AS n_other_low,
       |  floor(($crudeOr)*1e6 + 0.5)/1e6 AS crude_or,
       |  floor(($mhOr)*1e6 + 0.5)/1e6 AS or_mh,
       |  floor(($crudeOr / nullif($mhOr, 0))*1e6 + 0.5)/1e6
       |    AS confounding_ratio
       |FROM p""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mantel_haenszel" -> (mantelHaenszel _)
  )

  val oracle: Map[String, String] = Map(
    "agg_mantel_haenszel" -> mantelHaenszelOracle
  )
}
