package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.74 (round-25 batch 7) — effect size and parametric
  * variance homogeneity:
  *
  *  - [[cohensD]]: Cohen's d (and the small-sample Hedges' g
  *    correction) between URGENT and LOW order totals — the EFFECT
  *    SIZE companion every significance row lacks: `agg_welch_t`
  *    says whether the means differ, d says by HOW MANY pooled
  *    standard deviations (the number a practitioner actually
  *    reports), with the conventional negligible/small/medium/large
  *    magnitude label on the floored |d|.
  *
  *  - [[bartlettTest]]: Bartlett's χ²₄ variance-homogeneity test
  *    across the five priorities — the PARAMETRIC twin of
  *    `agg_levene_test` (Brown-Forsythe): sharper under normality
  *    (which `agg_jarque_bera` checks), fragile outside it; a
  *    pipeline runs both and reads the disagreement.
  *
  * Scale shapes: both are ONE map-side-combining conditional
  * aggregate over orders (fixed-order group columns, the
  * agg_anova_f discipline) — no joins, no windows; everything after
  * is a 1-row assembly.
  *
  * Determinism: per-group Σc and Σc² accumulate in exact
  * DECIMAL(38,0) cents (§1.5 r9; Σc² passes 2^63 at target scale)
  * with the oracle's VARCHAR routing (§1.5 r7); variances, d, g,
  * and Bartlett's statistic assemble once from shared formula text
  * (ln on identical doubles — both engines' IEEE log agree well
  * under the 6-dp floor, the agg_entropy precedent); the magnitude
  * label compares the ALREADY-floored |d| so the CASE never sees an
  * unrounded double.
  */
object Composite58 {

  // ---- agg_cohens_d -------------------------------------------------------
  private val CdA = "1-URGENT"
  private val CdB = "5-LOW"

  // s² = (n·Σc² − (Σc)²)/(n(n−1)); d = (m1 − m2)/sp.
  private def varF(i: Int): String =
    s"""((CAST(n$i AS DOUBLE)*q$i - s$i*s$i)
       | / nullif(CAST(n$i AS DOUBLE)*(n$i - 1), 0))""".stripMargin
  private val cdD =
    s"""((s0/nullif(CAST(n0 AS DOUBLE), 0) - s1/nullif(CAST(n1 AS DOUBLE), 0))
       | / nullif(sqrt(((CAST(n0 AS DOUBLE) - 1)*(${varF(0)})
       |   + (CAST(n1 AS DOUBLE) - 1)*(${varF(1)}))
       |   / nullif(CAST(n0 AS DOUBLE) + n1 - 2, 0)), 0))""".stripMargin
  private val cdDF = s"floor(($cdD)*1e6 + 0.5)/1e6"
  private val cdGF =
    s"floor((($cdD) * (1 - 3/(4*(CAST(n0 AS DOUBLE) + n1) - 9)))*1e6 + 0.5)/1e6"

  private[graft] def cohensDOn(orders: DataFrame): DataFrame = {
    val c = (money(col("o_totalprice")) * 100).cast("bigint")
    val o = orders.filter(col("o_orderpriority").isin(CdA, CdB))
      .select(col("o_orderpriority").as("g"), c.as("c"))
    val aggs = Seq(CdA, CdB).zipWithIndex.flatMap { case (p, i) => Seq(
      sum(when(col("g") === p, 1L).otherwise(0L)).as(s"n$i"),
      sum(when(col("g") === p, expr("CAST(c AS DECIMAL(19,0))"))
        .otherwise(expr("CAST(0 AS DECIMAL(19,0))")))
        .cast("double").as(s"s$i"),
      sum(when(col("g") === p,
          expr("CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
        .cast("double").as(s"q$i")) }
    o.groupBy().agg(aggs.head, aggs.tail: _*)
      .selectExpr("n0 AS n_urgent", "n1 AS n_low",
        s"$cdDF AS cohens_d",
        s"$cdGF AS hedges_g",
        // the NULL arm first: without it a null d (zero pooled sd)
        // falls through every comparison into ELSE 'large'
        s"""CASE WHEN $cdDF IS NULL THEN CAST(NULL AS STRING)
           | WHEN abs($cdDF) < 0.2 THEN 'negligible'
           | WHEN abs($cdDF) < 0.5 THEN 'small'
           | WHEN abs($cdDF) < 0.8 THEN 'medium'
           | ELSE 'large' END AS magnitude""".stripMargin)
  }

  private def cohensD(s: SparkSession, dir: String): DataFrame =
    cohensDOn(load(s, dir, "orders"))

  private val cohensDOracle = {
    val aggDefs = Seq(CdA, CdB).zipWithIndex.flatMap { case (p, i) => Seq(
      s"CAST(sum(CASE WHEN g = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS n$i",
      s"""CAST(CAST(sum(CASE WHEN g = '$p' THEN CAST(c AS DECIMAL(19,0))
         |  ELSE CAST(0 AS DECIMAL(19,0)) END) AS VARCHAR) AS DOUBLE)
         |  AS s$i""".stripMargin,
      s"""CAST(CAST(sum(CASE WHEN g = '$p' THEN
         |  CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
         |  ELSE CAST(0 AS DECIMAL(38,0)) END) AS VARCHAR) AS DOUBLE)
         |  AS q$i""".stripMargin)
    }.mkString(",\n    ")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS c
       |  FROM orders WHERE o_orderpriority IN ('$CdA', '$CdB')),
       |g AS (
       |  SELECT
       |    $aggDefs
       |  FROM o)
       |SELECT n0 AS n_urgent, n1 AS n_low,
       |  $cdDF AS cohens_d,
       |  $cdGF AS hedges_g,
       |  CASE WHEN $cdDF IS NULL THEN CAST(NULL AS VARCHAR)
       |   WHEN abs($cdDF) < 0.2 THEN 'negligible'
       |   WHEN abs($cdDF) < 0.5 THEN 'small'
       |   WHEN abs($cdDF) < 0.8 THEN 'medium'
       |   ELSE 'large' END AS magnitude
       |FROM g""".stripMargin
  }

  // ---- agg_bartlett_test ---------------------------------------------------
  private val BtGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val BtK = BtGroups.size

  // X² = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(sᵢ²)] / C,
  // C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).
  private val btNk = (0 until BtK).map(i => s"n$i").mkString(" + ")
  private val btSp =
    s"""((${(0 until BtK).map(i =>
        s"(CAST(n$i AS DOUBLE) - 1)*(${varF(i)})").mkString(" + ")})
       | / nullif(CAST(($btNk) AS DOUBLE) - $BtK, 0))""".stripMargin
  // ln(nullif(·, 0)): a zero variance (constant group) must yield
  // NULL identically — Spark's ln(0) is already NULL but DuckDB's is
  // -inf, and the law's brute fold needs one contract (scalacheck-
  // found via chooseNum's endpoint bias producing constant groups).
  private val btChi =
    s"""(((CAST(($btNk) AS DOUBLE) - $BtK)*ln(nullif($btSp, 0))
       | - (${(0 until BtK).map(i =>
          s"(CAST(n$i AS DOUBLE) - 1)*ln(nullif(${varF(i)}, 0))").mkString(" + ")}))
       | / (1 + ((${(0 until BtK).map(i =>
          s"1/nullif(CAST(n$i AS DOUBLE) - 1, 0)").mkString(" + ")})
       |   - 1/nullif(CAST(($btNk) AS DOUBLE) - $BtK, 0))
       |   / (3*($BtK - 1))))""".stripMargin
  private val btChiF = s"floor(($btChi)*1e6 + 0.5)/1e6"

  private[graft] def bartlettOn(orders: DataFrame): DataFrame = {
    val c = (money(col("o_totalprice")) * 100).cast("bigint")
    val o = orders.select(col("o_orderpriority").as("g"), c.as("c"))
    val aggs = BtGroups.zipWithIndex.flatMap { case (p, i) => Seq(
      sum(when(col("g") === p, 1L).otherwise(0L)).as(s"n$i"),
      sum(when(col("g") === p, expr("CAST(c AS DECIMAL(19,0))"))
        .otherwise(expr("CAST(0 AS DECIMAL(19,0))")))
        .cast("double").as(s"s$i"),
      sum(when(col("g") === p,
          expr("CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
        .cast("double").as(s"q$i")) }
    o.groupBy().agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"CAST($btNk AS BIGINT) AS n",
        s"CAST($BtK AS BIGINT) AS k",
        s"$btChiF AS bartlett_chi2",
        s"($btChiF > 9.487729) AS reject_equal_variance_5pct")
  }

  private def bartlettTest(s: SparkSession, dir: String): DataFrame =
    bartlettOn(load(s, dir, "orders"))

  private val bartlettOracle = {
    val aggDefs = BtGroups.zipWithIndex.flatMap { case (p, i) => Seq(
      s"CAST(sum(CASE WHEN g = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS n$i",
      s"""CAST(CAST(sum(CASE WHEN g = '$p' THEN CAST(c AS DECIMAL(19,0))
         |  ELSE CAST(0 AS DECIMAL(19,0)) END) AS VARCHAR) AS DOUBLE)
         |  AS s$i""".stripMargin,
      s"""CAST(CAST(sum(CASE WHEN g = '$p' THEN
         |  CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
         |  ELSE CAST(0 AS DECIMAL(38,0)) END) AS VARCHAR) AS DOUBLE)
         |  AS q$i""".stripMargin)
    }.mkString(",\n    ")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS c
       |  FROM orders),
       |g AS (
       |  SELECT
       |    $aggDefs
       |  FROM o)
       |SELECT CAST($btNk AS BIGINT) AS n,
       |  CAST($BtK AS BIGINT) AS k,
       |  $btChiF AS bartlett_chi2,
       |  ($btChiF > 9.487729) AS reject_equal_variance_5pct
       |FROM g""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_cohens_d" -> (cohensD _),
    "agg_bartlett_test" -> (bartlettTest _)
  )

  val oracle: Map[String, String] = Map(
    "agg_cohens_d" -> cohensDOracle,
    "agg_bartlett_test" -> bartlettOracle
  )
}
