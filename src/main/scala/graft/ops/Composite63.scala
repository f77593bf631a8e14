package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.79 (round-26 batch 1) — contingency-table effect
  * size and the small-sample exact test:
  *
  *  - [[cramersV]]: Cramér's V (with the Bergsma bias-corrected
  *    variant as a second column) over the market-segment ×
  *    order-priority table — the EFFECT SIZE a chi-square reader
  *    asks for next (`agg_chi_square` surfaces per-cell
  *    contributions but deliberately no χ² total, because a
  *    cross-engine double sum over a data-dependent cell set is
  *    accumulation-order-dependent; here the 5×5 domain is FIXED by
  *    the corpus dictionary, so the total is a fixed-text sum of 25
  *    terms — same tree, same order, both engines).
  *
  *  - [[fisherExact]]: Fisher's exact test on the 2×2 of supplier
  *    region (EUROPE vs rest) × account standing (negative vs not)
  *    — the small-count companion to `agg_odds_ratio`'s Woolf
  *    asymptotics and `agg_mcnemar_test`'s paired χ²: when cells
  *    are small the χ² approximation fails and the hypergeometric
  *    tail sum is the defined answer. Two-sided p by the standard
  *    "sum all tables no more probable than observed" rule with the
  *    1e-7 relative slack (R's fisher.test convention), which also
  *    absorbs cross-engine libm drift at inclusion boundaries.
  *
  * Scale shapes: Cramér's V is ONE map-side-combining 25-cell
  * conditional aggregate over the fact (customer dim broadcast);
  * everything after is expression work on the single aggregate row.
  * Fisher is ONE 4-cell aggregate; the hypergeometric support
  * explode is bounded by least(r1, c1) + 1 rows and the
  * log-factorials are in-expression folds over sequence(2, x) —
  * per-row work O(n·support) on the 1-row stream, which is the
  * exact test's own validity domain (small strata; at large counts
  * the answer IS the asymptotic odds-ratio/chi-square row, and the
  * tail sum degenerates to 0/1 anyway).
  *
  * Determinism: all 25/4 cells are exact BIGINTs; χ²'s 25 double
  * terms and V assemble from one fixed-order shared expression text
  * (left-assoc adds — identical IEEE tree in both engines; margin
  * zero-checks compare INTEGERS, never products, so no overflow at
  * any scale). Fisher's lfact folds run STRICTLY LEFT in both
  * engines (Spark `aggregate`, DuckDB `list_reduce` — both
  * ln(2)+ln(3)+…), so summation order is shared and residual drift
  * is per-term libm ulps (~1e-11 in lp), absorbed by the 1e-7
  * inclusion slack and the 6-dp floor.
  */
object Composite63 {

  // ---- agg_cramers_v -----------------------------------------------------
  // The corpus dictionaries (TESTDATA.md): 5 market segments × 5
  // order priorities. Fixing the domain in the query text is what
  // makes the χ² TOTAL deterministic — the 25 terms sum in one
  // fixed-text expression instead of a data-ordered aggregation.
  private val CvSegs = Seq(
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val CvPris = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val cvIJ =
    for (i <- CvSegs.indices; j <- CvPris.indices) yield (i, j)

  private def cvCellAgg(i: Int, j: Int): String =
    s"CAST(sum(CASE WHEN c_mktsegment = '${CvSegs(i)}' AND " +
      s"o_orderpriority = '${CvPris(j)}' THEN 1 ELSE 0 END) AS BIGINT)"

  private val cvMargins: Seq[String] =
    CvSegs.indices.map(i =>
      CvPris.indices.map(j => s"n$i$j").mkString("+") + s" AS r$i") ++
    CvPris.indices.map(j =>
      CvSegs.indices.map(i => s"n$i$j").mkString("+") + s" AS c$j") :+
    (cvIJ.map { case (i, j) => s"n$i$j" }.mkString("+") + " AS g")

  // Zero-margin cells contribute 0 by definition (their expected
  // count is 0); the CASE compares the margin INTEGERS to 0 rather
  // than their product, so the guard cannot overflow at any scale.
  private val cvChi2: String = cvIJ.map { case (i, j) =>
    s"(CASE WHEN r$i = 0 OR c$j = 0 THEN CAST(0 AS DOUBLE) ELSE " +
      s"(CAST(n$i$j AS DOUBLE)*g - CAST(r$i AS DOUBLE)*c$j)" +
      s"*(CAST(n$i$j AS DOUBLE)*g - CAST(r$i AS DOUBLE)*c$j)" +
      s"/(CAST(g AS DOUBLE)*r$i*c$j) END)"
  }.mkString(" + ")
  private val cvRowsUsed = "CAST(" + CvSegs.indices
    .map(i => s"(CASE WHEN r$i > 0 THEN 1 ELSE 0 END)").mkString("+") +
    " AS BIGINT)"
  private val cvColsUsed = "CAST(" + CvPris.indices
    .map(j => s"(CASE WHEN c$j > 0 THEN 1 ELSE 0 END)").mkString("+") +
    " AS BIGINT)"

  // V = sqrt(χ²/(g·(min(R,C)−1))); the Bergsma correction subtracts
  // the independence-expected φ² and shrinks the effective table
  // dims — both guarded NULL on the degenerate 1×c / r×1 / g≤1
  // tables (nullif), never a divide-by-zero or sqrt(negative)
  // (greatest(0, ·) clamps the corrected φ²).
  private val cvFinal: Seq[String] = Seq(
    "g AS n_total", "rr AS n_rows_used", "cc AS n_cols_used",
    "floor(chi2*1e6 + 0.5)/1e6 AS chi_square",
    "floor(sqrt(chi2 / nullif(CAST(g AS DOUBLE) * nullif(least(rr, cc)" +
      " - 1, 0), 0))*1e6 + 0.5)/1e6 AS cramers_v",
    "floor(sqrt(greatest(CAST(0 AS DOUBLE), chi2/g - (CAST(rr AS DOUBLE)" +
      " - 1)*(cc - 1)/nullif(CAST(g AS DOUBLE) - 1, 0))" +
      " / nullif(least(rr - (CAST(rr AS DOUBLE) - 1)*(rr - 1)" +
      "/nullif(CAST(g AS DOUBLE) - 1, 0)," +
      " cc - (CAST(cc AS DOUBLE) - 1)*(cc - 1)" +
      "/nullif(CAST(g AS DOUBLE) - 1, 0)) - 1, 0))*1e6 + 0.5)/1e6" +
      " AS cramers_v_corrected")

  /** Core over a (c_mktsegment, o_orderpriority) pair relation —
    * test seam for the scalacheck law vs the brute table fold. */
  private[graft] def cramersVOn(pairs: DataFrame): DataFrame = {
    val cells = cvIJ.map { case (i, j) => expr(cvCellAgg(i, j)).as(s"n$i$j") }
    pairs.groupBy()
      .agg(cells.head, cells.tail: _*)
      .selectExpr("*" +: cvMargins: _*)
      .selectExpr("g", s"$cvChi2 AS chi2",
        s"$cvRowsUsed AS rr", s"$cvColsUsed AS cc")
      .selectExpr(cvFinal: _*)
  }

  private def cramersV(s: SparkSession, dir: String): DataFrame =
    cramersVOn(load(s, dir, "orders")
      .join(broadcast(load(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority")))

  private val cramersVOracle = {
    val cellDefs = cvIJ.map { case (i, j) => s"${cvCellAgg(i, j)} AS n$i$j" }
      .mkString(",\n    ")
    s"""WITH cells AS (
       |  SELECT
       |    $cellDefs
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |m AS (SELECT *, ${cvMargins.mkString(", ")} FROM cells),
       |s AS (SELECT g, $cvChi2 AS chi2,
       |  $cvRowsUsed AS rr, $cvColsUsed AS cc FROM m)
       |SELECT ${cvFinal.mkString(",\n  ")}
       |FROM s""".stripMargin
  }

  // ---- agg_fisher_exact ---------------------------------------------------
  // lfact(x) = Σ_{i=2..x} ln(i) as a STRICT LEFT fold in both
  // engines: Spark's `aggregate` folds acc=0 ⊕ ln(2) ⊕ ln(3) ⊕ …
  // and DuckDB's `list_reduce` folds ln(2) ⊕ ln(3) ⊕ … — the same
  // IEEE addition sequence (0 + x == x exactly), so the only
  // cross-engine drift left is per-term ln ulps. Starting the fold
  // at 2 keeps DuckDB's list_reduce off its empty-list error AND
  // Spark's sequence() off its descending-sequence corner
  // (sequence(2, 1) would count DOWN, not return empty).
  private def lfSpark(x: String): String =
    s"(CASE WHEN ($x) < 2 THEN CAST(0 AS DOUBLE) ELSE " +
      s"aggregate(sequence(CAST(2 AS BIGINT), CAST(($x) AS BIGINT)), " +
      s"CAST(0 AS DOUBLE), (acc, i) -> acc + ln(i)) END)"
  private def lfDuck(x: String): String =
    s"(CASE WHEN ($x) < 2 THEN CAST(0 AS DOUBLE) ELSE " +
      s"list_reduce(list_transform(generate_series(CAST(2 AS BIGINT), " +
      s"CAST(($x) AS BIGINT)), i -> ln(i)), (acc, i) -> acc + i) END)"

  // ln P(table with first cell = kc | margins) — the hypergeometric
  // log-pmf; kc is a column name, lf the engine's lfact spelling.
  private def fisherLp(lf: String => String, kc: String): String =
    s"(${lf("r1")} + ${lf("r2")} + ${lf("c1")} + ${lf("n - c1")}" +
      s" - ${lf("n")} - ${lf(kc)} - ${lf(s"r1 - ($kc)")}" +
      s" - ${lf(s"c1 - ($kc)")} - ${lf(s"r2 - c1 + ($kc)")})"

  // Two-sided: sum every table in the support whose probability is
  // ≤ the observed one, with R's 1e-7 relative slack (log-space).
  // least(1, ·) clamps the ulp-overshoot of a full-support sum.
  private val fisherPSum =
    "sum(CASE WHEN lp <= lpo + 1e-7 THEN exp(lp) ELSE CAST(0 AS DOUBLE) END)"
  private val fisherPF =
    "floor(least(CAST(1 AS DOUBLE), praw)*1e6 + 0.5)/1e6"
  private val fisherFinal: Seq[String] = Seq(
    "a AS n_europe_neg", "b AS n_europe_pos",
    "c AS n_other_neg", "d AS n_other_pos",
    s"$fisherPF AS p_two_sided",
    s"($fisherPF < 0.05) AS reject_independence_5pct")

  private def fisherCellAggs(gc: String, hc: String): Seq[(String, String)] =
    Seq(
      "a" -> s"CAST(sum(CASE WHEN ($gc) AND ($hc) THEN 1 ELSE 0 END) AS BIGINT)",
      "b" -> s"CAST(sum(CASE WHEN ($gc) AND NOT ($hc) THEN 1 ELSE 0 END) AS BIGINT)",
      "c" -> s"CAST(sum(CASE WHEN NOT ($gc) AND ($hc) THEN 1 ELSE 0 END) AS BIGINT)",
      "d" -> s"CAST(sum(CASE WHEN NOT ($gc) AND NOT ($hc) THEN 1 ELSE 0 END) AS BIGINT)")

  private val fisherMargins = Seq(
    "a + b AS r1", "c + d AS r2", "a + c AS c1", "a + b + c + d AS n")

  /** Core over a relation with boolean columns (grp, hit) — test
    * seam for the scalacheck law vs the brute lgamma fold. */
  private[graft] def fisherExactOn(flags: DataFrame): DataFrame = {
    val cells = fisherCellAggs("grp", "hit")
      .map { case (nm, sql) => expr(sql).as(nm) }
    flags.groupBy()
      .agg(cells.head, cells.tail: _*)
      .selectExpr(Seq("a", "b", "c", "d") ++ fisherMargins: _*)
      .withColumn("k", explode(expr(
        "sequence(greatest(CAST(0 AS BIGINT), c1 - r2), least(r1, c1))")))
      .selectExpr("a", "b", "c", "d",
        s"${fisherLp(lfSpark, "k")} AS lp",
        s"${fisherLp(lfSpark, "a")} AS lpo")
      .groupBy(col("a"), col("b"), col("c"), col("d"))
      .agg(expr(fisherPSum).as("praw"))
      .selectExpr(fisherFinal: _*)
  }

  private def fisherExact(s: SparkSession, dir: String): DataFrame =
    fisherExactOn(load(s, dir, "supplier")
      .join(broadcast(load(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select((col("r_name") === "EUROPE").as("grp"),
        (money(col("s_acctbal")) < 0).as("hit")))

  private val fisherOracle = {
    val cellDefs = fisherCellAggs(
      "r_name = 'EUROPE'", "CAST(s_acctbal AS DECIMAL(15,2)) < 0")
      .map { case (nm, sql) => s"$sql AS $nm" }.mkString(",\n    ")
    s"""WITH g AS (
       |  SELECT
       |    $cellDefs
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey),
       |m AS (SELECT a, b, c, d, ${fisherMargins.mkString(", ")} FROM g),
       |ks AS (
       |  SELECT m.*, unnest(generate_series(
       |    greatest(CAST(0 AS BIGINT), c1 - r2), least(r1, c1))) AS k
       |  FROM m),
       |t AS (
       |  SELECT a, b, c, d,
       |    ${fisherLp(lfDuck, "k")} AS lp,
       |    ${fisherLp(lfDuck, "a")} AS lpo
       |  FROM ks),
       |p AS (
       |  SELECT a, b, c, d, $fisherPSum AS praw
       |  FROM t GROUP BY a, b, c, d)
       |SELECT ${fisherFinal.mkString(",\n  ")}
       |FROM p""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_cramers_v" -> (cramersV _),
    "agg_fisher_exact" -> (fisherExact _)
  )

  val oracle: Map[String, String] = Map(
    "agg_cramers_v" -> cramersVOracle,
    "agg_fisher_exact" -> fisherOracle
  )
}
