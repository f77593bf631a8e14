package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.43 — round-16 seventh batch: ABC inventory
  * classification and the Fano dispersion monitor.
  *
  * Scale shapes: ABC ranks the part-level revenue aggregate (item
  * alphabet, not fact volume) under one running-sum window and
  * reduces to three class rows; Fano is two chained hash aggregates
  * over horizon-bounded hourly cells.
  *
  * Determinism: cumulative revenue stays exact decimal through the
  * running sum; shares and the class CASE compare the SAME derived
  * double on both engines; Fano moments are exact integers until
  * one IEEE assembly.
  */
object Composite26 {

  // ---- agg_abc_classification --------------------------------------
  // ABC inventory analysis: parts ranked by revenue descending, class
  // A = first 80% of cumulative revenue share, B = next 15%, C =
  // the tail. Output: per-class part counts, revenue, and share —
  // the warehouse slotting staple.
  private def abcClassification(s: SparkSession, dir: String): DataFrame = {
    val rev = load(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(money(col("l_extendedprice"))).cast("decimal(18,2)").as("r"))
      .localCheckpoint(false) // feeds the grid AND the per-part join
    // r19: the revenue total is the sum of the grid's mass column, so
    // it rides the prefix-sum pass as a constant column (DistRank
    // totals — exact decimal addition, value-identical to the
    // standalone aggregate + crossJoin broadcast it replaces).
    // r18 retrofit: the cumulative-revenue window ran the whole part
    // alphabet through ONE task. Grid form instead: distinct revenue
    // values carry their mass (r·count, exact decimal) through one
    // [[graft.util.DistRank.globalPrefixSum]] pass keyed r DESC (sb =
    // exact revenue strictly above this value); each part then adds
    // j·r for its rank j among equal-revenue parts — a partitionBy(r)
    // window bounded by the tie group, never global. sb + j·r IS the
    // running sum over (r DESC, partkey), cast to the same
    // DECIMAL(18,2) — the oracle hash cannot move.
    val grid = rev.groupBy(col("r").as("rv"))
      .agg(sum(col("r")).cast("decimal(38,2)").as("mass"))
    val pre = graft.util.DistRank
      .globalPrefixSumsWithTotals(grid, Seq("sb" -> col("mass")),
        col("rv").desc, totals = Seq("tot0" -> col("mass")))
      .select(col("rv"), col("sb"),
        col("tot0").cast("decimal(18,2)").as("tot"))
    val tieW = Window.partitionBy(col("r")).orderBy(col("l_partkey"))
    rev.join(pre, col("r") === col("rv"))
      .withColumn("j", row_number().over(tieW).cast("long"))
      .withColumn("crun",
        (col("sb") + col("j") * col("r")).cast("decimal(18,2)"))
      .select(col("l_partkey"), col("r"),
        (asD(col("crun")) / asD(col("tot"))).as("cshare"))
      .select(col("l_partkey"), col("r"),
        when(col("cshare") <= 0.8, "A")
          .when(col("cshare") <= 0.95, "B")
          .otherwise("C").as("abc"))
      .groupBy(col("abc"))
      .agg(count(lit(1)).as("n_parts"),
        asD(sum(col("r")).cast("decimal(18,2)")).as("revenue"))
      .orderBy("abc")
  }

  private val abcClassificationOracle =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
      |      AS DECIMAL(18,2)) AS r
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(r) AS DECIMAL(18,2)) AS tot FROM rev),
      |run AS (
      |  SELECT l_partkey, r,
      |    CAST(CAST(CAST(sum(r) OVER (ORDER BY r DESC, l_partkey)
      |        AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE) /
      |      CAST(CAST(tot.tot AS VARCHAR) AS DOUBLE) AS cshare
      |  FROM rev CROSS JOIN tot),
      |cls AS (
      |  SELECT l_partkey, r,
      |    CASE WHEN cshare <= 0.8 THEN 'A'
      |      WHEN cshare <= 0.95 THEN 'B'
      |      ELSE 'C' END AS abc
      |  FROM run)
      |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(CAST(CAST(sum(r) AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE)
      |    AS revenue
      |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- evt_fano_factor ---------------------------------------------
  // Fano dispersion per event type: variance/mean of the hourly
  // arrival counts — ≈1 for Poisson traffic, ≫1 for bursty. Exact
  // integer hourly cells; population variance assembled once.
  private def fanoFactor(s: SparkSession, dir: String): DataFrame = {
    val hourly = loadEvents(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .select(col("event_type"), col("n_hours"),
        col("n_hours").cast("double").as("n"),
        col("sc").cast("double").as("sc"),
        col("scc").cast("double").as("scc"))
      .select(col("event_type"), col("n_hours"),
        (col("sc") / col("n")).as("mean_hourly"),
        (((col("scc") - col("sc") * col("sc") / col("n")) / col("n")) /
          (col("sc") / col("n"))).as("fano"))
      .orderBy("event_type")
  }

  private val fanoFactorOracle =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n_hours,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS sc,
      |    CAST(CAST(sum(c * c) AS BIGINT) AS DOUBLE) AS scc
      |  FROM hourly GROUP BY 1)
      |SELECT event_type, n_hours,
      |  sc / n AS mean_hourly,
      |  (((scc - sc * sc / n) / n) / (sc / n)) AS fano
      |FROM m ORDER BY event_type""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_abc_classification" -> (abcClassification _),
    "evt_fano_factor" -> (fanoFactor _)
  )

  val oracle: Map[String, String] = Map(
    "agg_abc_classification" -> abcClassificationOracle,
    "evt_fano_factor" -> fanoFactorOracle
  )
}
