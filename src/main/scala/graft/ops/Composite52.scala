package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.68 (round-25 batch 1) — the PAIRED rank tests,
  * closing the rank-test matrix `agg_mann_whitney` (independent
  * 2-group) / `agg_kruskal_wallis` (independent k-group) / this file
  * (paired 2-group and paired k-group):
  *
  *  - [[wilcoxonSignedRank]]: Wilcoxon signed-rank over per-customer
  *    spend paired across two adjacent years (1996 vs 1997) — "did
  *    the SAME customers shift?", the within-subject question
  *    Mann-Whitney's independent pooling cannot answer. Zero
  *    differences drop (the standard Wilcoxon treatment), the
  *    normal approximation carries the exact tie correction, no
  *    continuity correction (documented choice, mirrored verbatim in
  *    the oracle).
  *
  *  - [[friedmanTest]]: Friedman's χ² over (year, month) blocks ×
  *    the five order priorities on monthly spend — the paired
  *    k-group complement of Kruskal-Wallis (each month is its own
  *    control: priorities are ranked WITHIN a month, so secular
  *    drift across months never pollutes the comparison).
  *
  * Scale shapes: Wilcoxon reduces orders to one customer-keyed
  * aggregate, then ranks on the DISTINCT |d| axis — which is
  * entity-sized (differences of customer spends, not a bounded value
  * grid), so `below` comes from [[graft.util.DistRank.globalPrefixSum]]'s
  * two-pass distributed prefix sum, never a single-partition global
  * window (the agg_weighted_median lesson). Friedman's ranks live in
  * windows partitioned by block — blocks are calendar-bounded and
  * each holds exactly k = 5 rows, so every window is O(k).
  *
  * Determinism: both tests keep DOUBLED average ranks as exact
  * BIGINTs (2·r̄ = 2·below + cnt + 1; in-block 2·r = 2·(rank−1) +
  * t + 1); Wilcoxon's Σ pcnt·2r̄ rank sum accumulates in
  * DECIMAL(38,0) (O(n²) at the 100 TB target — a BIGINT sum wraps in
  * Spark and widens to HUGEINT in DuckDB, §1.5 r9) and the oracle
  * routes it through VARCHAR (§1.5 r7); tie terms are exact BIGINTs;
  * z/Q assemble once from identical formula text with every n-degree
  * product widened to DOUBLE before multiplying (the ADVICE-r13
  * n-cube rule); verdicts compare after the 6-dp floor.
  */
object Composite52 {

  // ---- agg_wilcoxon_signed_rank -----------------------------------------
  private val WxY1 = 1996
  private val WxY2 = 1997

  // z = (2W⁺ − n(n+1)/2) / sqrt(n(n+1)(2n+1)/6 − Σ(t³−t)/12), the
  // doubled-rank form of the usual W⁺ approximation (doubling W and
  // its mean/sd leaves z unchanged; 12/48 become 6/12).
  private val wxZ =
    """((w2p - CAST(n AS DOUBLE)*(n + 1)/2)
      | / nullif(sqrt(CAST(n AS DOUBLE)*(n + 1)*(2*n + 1)/6
      |   - CAST(tt AS DOUBLE)/12), 0))""".stripMargin
  private val wxZF = s"floor(($wxZ)*1e6 + 0.5)/1e6"

  /** Per-customer nonzero spend differences across the paired years
    * — shared by the signed-rank test here and Composite57's sign
    * test (identical pairing, so the two verdicts are comparable). */
  private[graft] def pairedDiffs(orders: DataFrame): DataFrame = {
    val yr = year(col("o_orderdate").cast("date"))
    orders
      .filter(yr.isin(WxY1, WxY2))
      .select(col("o_custkey").as("c"), yr.as("y"),
        (money(col("o_totalprice")) * 100).cast("bigint").as("v"))
      .groupBy(col("c"))
      .agg(sum(when(col("y") === WxY1, col("v")).otherwise(0L)).as("s1"),
        sum(when(col("y") === WxY1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("y") === WxY2, col("v")).otherwise(0L)).as("s2"),
        sum(when(col("y") === WxY2, 1L).otherwise(0L)).as("c2"))
      .filter(col("c1") > 0 && col("c2") > 0)
      .select((col("s2") - col("s1")).as("d"))
      .filter(col("d") =!= 0L)
  }

  /** The shared paired-diffs CTE prefix (oracle twin of
    * [[pairedDiffs]]) — ends with a `d(d)` relation. */
  private[graft] val pairedDiffsSql =
    s"""WITH o AS (
       |  SELECT o_custkey AS c, year(CAST(o_orderdate AS DATE)) AS y,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS v
       |  FROM orders
       |  WHERE year(CAST(o_orderdate AS DATE)) IN ($WxY1, $WxY2)),
       |p AS (
       |  SELECT c,
       |    CAST(sum(CASE WHEN y = $WxY1 THEN v ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN y = $WxY1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN y = $WxY2 THEN v ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(sum(CASE WHEN y = $WxY2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
       |  FROM o GROUP BY 1),
       |d AS (
       |  SELECT s2 - s1 AS d FROM p
       |  WHERE c1 > 0 AND c2 > 0 AND s2 - s1 <> 0)""".stripMargin

  private[graft] def wilcoxonOn(orders: DataFrame): DataFrame = {
    val pairs = pairedDiffs(orders)
    val vc = pairs.groupBy(abs(col("d")).as("a"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("pcnt"))
    val ranked = graft.util.DistRank
      .globalPrefixSum(vc, "below", col("a"), col("cnt"))
      .select(col("cnt"), col("pcnt"),
        (lit(2L) * col("below") + col("cnt") + 1L).as("r2"))
    ranked.groupBy()
      .agg(sum(col("cnt")).as("n"),
        sum(expr("CAST(pcnt AS DECIMAL(19,0)) * CAST(r2 AS DECIMAL(19,0))"))
          .cast("double").as("w2p"),
        // Cube in DECIMAL before multiplying: a BIGINT cnt³ wraps
        // silently in Spark (ANSI off) but raises in DuckDB once a
        // tie group exceeds ~2.09e6 rows — the 0f2c042 divergence
        // class. DECIMAL(19,0)·cnt·cnt stays exact through the
        // capped DECIMAL(38,0); the z formula casts once to DOUBLE.
        sum(expr("CAST(cnt AS DECIMAL(19,0)) * cnt * cnt - cnt")).as("tt"))
      .selectExpr("n AS n_pairs",
        "w2p/2 AS w_plus",
        "CAST(n AS DOUBLE)*(n + 1)/2 - w2p/2 AS w_minus",
        s"$wxZF AS z_stat",
        s"(abs($wxZF) > 1.959964) AS reject_location_shift_5pct")
  }

  private def wilcoxonSignedRank(s: SparkSession, dir: String): DataFrame =
    wilcoxonOn(load(s, dir, "orders"))

  private val wilcoxonOracle =
    s"""$pairedDiffsSql,
       |vc AS (
       |  SELECT abs(d) AS a, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pcnt
       |  FROM d GROUP BY 1),
       |r AS (
       |  SELECT cnt, pcnt,
       |    2*(CAST(sum(cnt) OVER (ORDER BY a
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - cnt) + cnt + 1 AS r2
       |  FROM vc),
       |g AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
       |    CAST(CAST(sum(CAST(pcnt AS DECIMAL(19,0))
       |      * CAST(r2 AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS w2p,
       |    CAST(CAST(sum(CAST(cnt AS DECIMAL(19,0))*cnt*cnt - cnt)
       |      AS VARCHAR) AS DOUBLE) AS tt
       |  FROM r)
       |SELECT n AS n_pairs,
       |  w2p/2 AS w_plus,
       |  CAST(n AS DOUBLE)*(n + 1)/2 - w2p/2 AS w_minus,
       |  $wxZF AS z_stat,
       |  (abs($wxZF) > 1.959964) AS reject_location_shift_5pct
       |FROM g""".stripMargin

  // ---- agg_friedman_test -------------------------------------------------
  private val FrGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val FrK = FrGroups.size

  // Q = 12/(n·k(k+1))·Σ R_j² − 3n(k+1) in the doubled-rank form
  // (R2 = 2R ⇒ 12/4 = 3); tie-corrected Q' = Q / (1 − Σ(t³−t)/(n·k·(k²−1))).
  private val frQ =
    s"""((3*(${(0 until FrK).map(i =>
        s"CAST(r$i AS DOUBLE)*r$i").mkString(" + ")}))
       | / (CAST(n AS DOUBLE)*$FrK*(${FrK + 1}))
       | - 3*CAST(n AS DOUBLE)*(${FrK + 1}))""".stripMargin
  private val frQcRaw =
    s"($frQ / nullif(1 - CAST(tt AS DOUBLE)/(CAST(n AS DOUBLE)*$FrK*(${FrK * FrK - 1})), 0))"
  private val frQc = s"floor(($frQcRaw)*1e6 + 0.5)/1e6"
  // Kendall's W (coefficient of concordance), tie-corrected Siegel
  // form: W = χ²_F/(n(k−1)) — algebraically exact for the
  // tie-corrected Q' too (both corrections divide the same ΣT term),
  // so W reuses the rank sums Friedman already computed; one
  // shared-text division (VERDICT r17 missing item 4).
  private val frW =
    s"floor((($frQcRaw) / nullif(CAST(n AS DOUBLE)*(${FrK - 1}), 0))*1e6 + 0.5)/1e6"

  /** Shared rank-sum moments (doubled per-block ranks r0..r4, block
    * count n, tie term tt) — one pass feeding both `agg_friedman_test`
    * and `agg_kendalls_w`. */
  private[graft] def frMomentsOn(orders: DataFrame): DataFrame = {
    val cell = orders
      .select((year(col("o_orderdate").cast("date")) * 100 +
          month(col("o_orderdate").cast("date"))).as("b"),
        col("o_orderpriority").as("g"),
        (money(col("o_totalprice")) * 100).cast("bigint").as("v"))
      .groupBy(col("b"), col("g")).agg(sum(col("v")).as("s"))
    // Paired design: a block enters only when every treatment is
    // present (k rows); in-block doubled average rank 2·r = 2·(rank−1)
    // + t + 1 — rank() is exactly 1 + |strictly smaller|, t the tie
    // width — so rank sums stay exact BIGINTs. All three windows are
    // block-partitioned (≤ k rows each).
    val ranked = cell
      .withColumn("kk", count(lit(1)).over(Window.partitionBy(col("b"))))
      .filter(col("kk") === FrK)
      .withColumn("rk", rank().over(
        Window.partitionBy(col("b")).orderBy(col("s"))).cast("long"))
      .withColumn("t", count(lit(1)).over(
        Window.partitionBy(col("b"), col("s"))))
      .select(col("b"), col("g"),
        (lit(2L) * (col("rk") - 1L) + col("t") + 1L).as("r2"),
        // Σ_b Σ_v (t³−t) unrolled per ROW: each (b, v) tie group of
        // width t contributes t³−t once == t²−1 from each of its t
        // rows. t ≤ k, so the cube is exact without widening.
        (col("t") * col("t") - 1L).as("tterm"))
    val aggs =
      FrGroups.zipWithIndex.map { case (p, i) =>
        sum(when(col("g") === p, col("r2")).otherwise(0L)).as(s"r$i") } ++
      Seq((count(lit(1)) / FrK).cast("long").as("n"),
        sum(col("tterm")).as("tt"))
    ranked.groupBy().agg(aggs.head, aggs.tail: _*)
  }

  private[graft] def friedmanOn(orders: DataFrame): DataFrame =
    frMomentsOn(orders)
      .selectExpr("n AS n_blocks", s"CAST($FrK AS BIGINT) AS k",
        s"$frQc AS q_stat",
        s"($frQc > 9.487729) AS reject_equal_treatments_5pct")

  /** Kendall's W over the same monthly-block × priority design —
    * the EFFECT SIZE beside the Friedman verdict (how strongly the
    * blocks agree on the treatment ordering, 0 = none, 1 = perfect);
    * reuses the identical rank-sum moments. */
  private[graft] def kendallsWOn(orders: DataFrame): DataFrame =
    frMomentsOn(orders)
      .selectExpr("n AS n_blocks", s"CAST($FrK AS BIGINT) AS k",
        s"$frQc AS q_stat",
        s"$frW AS kendalls_w")

  private def friedmanTest(s: SparkSession, dir: String): DataFrame =
    friedmanOn(load(s, dir, "orders"))

  private def kendallsW(s: SparkSession, dir: String): DataFrame =
    kendallsWOn(load(s, dir, "orders"))

  // Shared CTE text through the rank-sum moments `g` — the Friedman
  // verdict, Kendall's W, and Composite82's Page trend test all grade
  // the SAME rank sums.
  private[graft] val friedmanOracleCore = {
    val aggDefs = FrGroups.zipWithIndex.map { case (p, i) =>
      s"CAST(sum(CASE WHEN g = '$p' THEN r2 ELSE 0 END) AS BIGINT) AS r$i"
    }.mkString(",\n    ")
    s"""WITH cell AS (
       |  SELECT year(CAST(o_orderdate AS DATE))*100
       |      + month(CAST(o_orderdate AS DATE)) AS b,
       |    o_orderpriority AS g,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT))
       |      AS BIGINT) AS s
       |  FROM orders GROUP BY 1, 2),
       |full_b AS (
       |  SELECT b, g, s,
       |    CAST(count(*) OVER (PARTITION BY b) AS BIGINT) AS kk,
       |    CAST(rank() OVER (PARTITION BY b ORDER BY s) AS BIGINT) AS rk,
       |    CAST(count(*) OVER (PARTITION BY b, s) AS BIGINT) AS t
       |  FROM cell),
       |ranked AS (
       |  SELECT b, g, 2*(rk - 1) + t + 1 AS r2, t*t - 1 AS tterm
       |  FROM full_b WHERE kk = $FrK),
       |g AS (
       |  SELECT
       |    $aggDefs,
       |    CAST(count(*) / $FrK AS BIGINT) AS n,
       |    CAST(sum(tterm) AS BIGINT) AS tt
       |  FROM ranked)
       |""".stripMargin
  }

  private val friedmanOracle =
    s"""${friedmanOracleCore}SELECT n AS n_blocks, CAST($FrK AS BIGINT) AS k,
       |  $frQc AS q_stat,
       |  ($frQc > 9.487729) AS reject_equal_treatments_5pct
       |FROM g""".stripMargin

  private val kendallsWOracle =
    s"""${friedmanOracleCore}SELECT n AS n_blocks, CAST($FrK AS BIGINT) AS k,
       |  $frQc AS q_stat,
       |  $frW AS kendalls_w
       |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_wilcoxon_signed_rank" -> (wilcoxonSignedRank _),
    "agg_friedman_test" -> (friedmanTest _),
    "agg_kendalls_w" -> (kendallsW _)
  )

  val oracle: Map[String, String] = Map(
    "agg_wilcoxon_signed_rank" -> wilcoxonOracle,
    "agg_friedman_test" -> friedmanOracle,
    "agg_kendalls_w" -> kendallsWOracle
  )
}
