package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.22 — round-11 nonparametric tests: Mann–Whitney U
  * (rank-sum) and the two-sample Kolmogorov–Smirnov statistic, both
  * over the AUTOMOBILE vs HOUSEHOLD account-balance slices that
  * agg_welch_t already tests parametrically.
  *
  * Both statistics need GLOBAL order statistics of the pooled
  * sample; both reduce to the grouped (value, per-group count) grid
  * first and take cumulative counts from
  * [[graft.util.DistRank.globalPrefixSum]] (range partitions +
  * broadcast offsets — no single-partition stage at any pool width;
  * the r16-verdict rank-family retrofit replaced the former bare
  * `Window.orderBy` funnels here). Everything that feeds the final
  * statistic is exact: ranks are integers, tied-rank means are exact
  * binary halves (sums of halves are exact in doubles at any
  * accumulation order), and the KS sup-distance is an integer
  * cross-product |c₁·n₂ − c₂·n₁| maximized BEFORE the one double
  * division.
  */
object Composite8 {

  // shared with Composite76's Wasserstein / trimmed-mean rows: the
  // whole two-sample family tests the same pooled slice
  private[graft] def pooled(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("c_acctbal").as("x"),
        (col("c_mktsegment") === "AUTOMOBILE").cast("int").as("i1"))

  // ---- agg_mann_whitney --------------------------------------------
  // Mann–Whitney U with tie-corrected normal approximation. Tied
  // ranks use min-rank + (t−1)/2 (exact halves); the tie term
  // Σ(t³−t) folds into the SAME windowed pass as Σ_rows (t²−1) —
  // no second value-group aggregate. The z denominator is the
  // shared-text tie-corrected variance.
  // nullif: the all-values-identical degenerate has tie-corrected
  // variance exactly 0 — z must be NULL on both engines (Spark 4
  // ANSI raises DIVIDE_BY_ZERO even for doubles; DuckDB returns
  // inf), the jonckheere r16 hardening.
  private val mwZ =
    """round((u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
      |    nullif(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
      |      (CAST(n1 + n2 + 1 AS DOUBLE) -
      |       CAST(tie AS DOUBLE) /
      |         (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))), 0), 6)""".stripMargin

  private val mwFinal =
    s"""SELECT n1, n2, u1 AS u_stat,
       |  $mwZ
       |    AS z_score
       |FROM m""".stripMargin

  /** Generic Mann–Whitney core over (value, group-1 indicator) — the
    * [[graft.Graft.mannWhitney]] facade surface. Same arithmetic as
    * the oracle text, but computed on the grouped (x, a, b) value
    * grid with `below` from [[graft.util.DistRank.globalPrefixSum]]
    * (range partitions + broadcast offsets): min-rank = below + 1,
    * tied-rank mean = rmin + (t−1)/2, so the group-1 rank sum is
    * Σ a·(rmin + (t−1)/2) — an exact multiple of ½ per value, hence
    * order-independent in doubles. The raw pooled rows never pass
    * through a global window (the pre-r17 shape ranked every row in
    * ONE task — a scale-killer on an entity-sized pool; r16 verdict
    * rank-family retrofit). The tie term Σ t(t²−1) cubes in DECIMAL
    * (BIGINT cubes wrap in Spark, raise in DuckDB — kwHc rule). */
  private[graft] def mannWhitneyOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val r = graft.util.DistRank
      .globalPrefixSum(v, "below", col("x"), col("a") + col("b"))
    val t = col("a") + col("b")
    r.agg(
      sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"),
      sum(col("a").cast("double") *
        (col("below").cast("double") + 1.0 + (t.cast("double") - 1.0) / 2.0))
        .as("rsum"),
      sum(expr("CAST(a + b AS DECIMAL(19,0)) * (a + b) * (a + b) - (a + b)"))
        .cast("bigint").as("tie"))
      .selectExpr("n1", "n2",
        "rsum - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0 AS u1",
        "tie")
      .selectExpr("n1", "n2", "u1 AS u_stat", s"$mwZ AS z_score")
  }

  private def mannWhitney(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    mannWhitneyOn(p, col("x"), col("i1") === 1)
  }

  private val mannWhitneyOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |r AS (
       |  SELECT i1,
       |    rank() OVER (ORDER BY x) AS rmin,
       |    count(*) OVER (PARTITION BY x) AS t
       |  FROM pooled),
       |m AS (
       |  SELECT CAST(sum(i1) AS BIGINT) AS n1,
       |    CAST(sum(1 - i1) AS BIGINT) AS n2,
       |    sum(CASE WHEN i1 = 1
       |      THEN CAST(rmin AS DOUBLE) + (CAST(t AS DOUBLE) - 1.0) / 2.0
       |      ELSE 0.0 END) -
       |      CAST(sum(i1) AS DOUBLE) * (CAST(sum(i1) AS DOUBLE) + 1.0) / 2.0
       |      AS u1,
       |    CAST(sum(t * t - 1) AS BIGINT) AS tie
       |  FROM r)
       |$mwFinal""".stripMargin

  // ---- agg_ks_test -------------------------------------------------
  // Two-sample KS: D = sup|F₁−F₂| found as the integer maximum of
  // |c₁·n₂ − c₂·n₁| over the pooled distinct values (cumulative
  // counts via one ordered window over the value groups), divided by
  // n₁·n₂ exactly once. The sup location reports the SMALLEST value
  // attaining it (dmax re-joined, min(x) — arg-max tie behavior is
  // engine-defined, so it is never relied on).
  private val ksFinal =
    """SELECT n1, n2,
      |  round(CAST(dmax AS DOUBLE) /
      |    (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks_d,
      |  x_at
      |FROM (
      |  SELECT max(dmax) AS dmax FROM d) best
      |CROSS JOIN (SELECT n1, n2 FROM tot) t
      |CROSS JOIN (
      |  SELECT min(x) AS x_at FROM d
      |  WHERE dmax = (SELECT max(dmax) FROM d)) loc""".stripMargin

  private val ksCore =
    """v AS (
      |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
      |    CAST(sum(1 - i1) AS BIGINT) AS b
      |  FROM pooled GROUP BY x),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2 FROM v),
      |d AS (
      |  SELECT x,
      |    abs(sum(a) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * (SELECT n2 FROM tot) -
      |        sum(b) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * (SELECT n1 FROM tot)) AS dmax
      |  FROM v)""".stripMargin

  /** Generic two-sample KS core over (value, group-1 indicator) — the
    * [[graft.Graft.ksTest]] facade surface. Same arithmetic as the
    * oracle: the sup distance is the exact integer │c₁·n₂−c₂·n₁│
    * maximized before the one double division; the sup location is
    * the smallest value attaining it. */
  private[graft] def ksTestOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    // Both cumulative counts ride one distributed prefix-sum pass
    // (exclusive → inclusive by adding own a/b) — the distinct-value
    // grid of a near-continuous measure is entity-sized, so a bare
    // Window.orderBy(x) would be a one-task funnel at target scale
    // (r16 verdict rank-family retrofit).
    val d = graft.util.DistRank.globalPrefixSums(v,
        Seq("ba" -> col("a"), "bb" -> col("b")), col("x"))
      .select(col("x"), (col("ba") + col("a")).as("ca"),
        (col("bb") + col("b")).as("cb"))
      .crossJoin(broadcast(tot))
      .select(col("x"), abs(col("ca") * col("n2") - col("cb") * col("n1")).as("dm"))
    val best = d.agg(max(col("dm")).as("dmax"))
    val loc = d.join(broadcast(best), col("dm") === col("dmax"))
      .agg(min(col("x")).as("x_at"))
    best.crossJoin(tot).crossJoin(loc)
      .selectExpr("n1", "n2",
        "round(CAST(dmax AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks_d",
        "x_at")
  }

  private def ksTest(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    ksTestOn(p, col("x"), col("i1") === 1)
  }

  private val ksOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |$ksCore
       |$ksFinal""".stripMargin

  // ---- agg_cliffs_delta ---------------------------------------------
  // Cliff's δ / rank-biserial effect size beside the Mann–Whitney
  // decision (the nonparametric analogue of agg_cohens_d — VERDICT
  // r16 missing item 3): δ = (#(x>y) − #(x<y)) / (n1·n2) over
  // cross-group pairs, computed EXACTLY from the same (x, a, b)
  // value grid + distributed prefix sum the U statistic uses — never
  // the O(n1·n2) pair materialization. With bb = Σ b strictly below
  // x, d2 = Σ_x a·(2·bb + b) = 2·#(>) + #(=) = 2U (midrank U), so
  // δ = d2/(n1·n2) − 1 with ONE double division (d2, n1, n2 exact
  // integers; the product cubes in DECIMAL — kwHc overflow rule).
  // Magnitude bands per Romano et al. 2006, CASE'd on the FLOORED δ
  // so a boundary value cannot split the engines.
  // nullif: an empty group makes n1·n2 = 0 — NULL on both engines
  // rather than Spark-4-ANSI DIVIDE_BY_ZERO vs DuckDB inf (the repo's
  // double-div-zero discipline; unreachable on the pinned slice but
  // the private[graft] *On core is a generic seam — ADVICE r17).
  private val cliffsDelta6 =
    """floor((CAST(d2 AS DOUBLE)/nullif(CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE), 0)
      |  - 1)*1e6 + 0.5)/1e6""".stripMargin
  private val cliffsMag =
    s"""CASE WHEN abs($cliffsDelta6) < 0.147E0 THEN 'negligible'
       |     WHEN abs($cliffsDelta6) < 0.33E0 THEN 'small'
       |     WHEN abs($cliffsDelta6) < 0.474E0 THEN 'medium'
       |     ELSE 'large' END""".stripMargin
  private val cliffsSelect = Seq("n1", "n2",
    "CAST(d2 AS DOUBLE)/2 AS u_stat",
    s"$cliffsDelta6 AS cliffs_delta",
    s"$cliffsMag AS magnitude")

  /** Generic Cliff's-δ core over (value, group-1 indicator) — same
    * grid + prefix-sum shape as [[mannWhitneyOn]]. */
  private[graft] def cliffsDeltaOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    graft.util.DistRank.globalPrefixSum(v, "bb", col("x"), col("b"))
      .agg(sum(col("a")).cast("bigint").as("n1"),
        sum(col("b")).cast("bigint").as("n2"),
        sum(expr("CAST(a AS DECIMAL(19,0)) * (2*bb + b)")).as("d2"))
      .selectExpr(cliffsSelect: _*)
  }

  private def cliffsDelta(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    cliffsDeltaOn(p, col("x"), col("i1") === 1)
  }

  private val cliffsDeltaOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
       |    CAST(sum(1 - i1) AS BIGINT) AS b
       |  FROM pooled GROUP BY x),
       |c AS (
       |  SELECT a, b,
       |    coalesce(CAST(sum(b) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS bb
       |  FROM v),
       |m AS (
       |  SELECT CAST(sum(a) AS BIGINT) AS n1,
       |    CAST(sum(b) AS BIGINT) AS n2,
       |    sum(CAST(a AS DECIMAL(19,0)) * (2*bb + b)) AS d2
       |  FROM c)
       |SELECT ${cliffsSelect.mkString(",\n  ")}
       |FROM m""".stripMargin

  // ---- agg_cvm_test ---------------------------------------------------
  // Two-sample Cramér–von Mises: T = (n₁n₂/N²)·Σ_pooled (F₁−F₂)² —
  // the INTEGRATED EDF distance beside agg_ks_test's supremum (KS
  // reacts to one large gap, CvM to many small ones). On the value
  // grid, F₁−F₂ at x is the SAME exact integer the KS row maximizes:
  // D = ca·n₂ − cb·n₁ over n₁n₂, so T = Σ t·D² / (n₁·n₂·N²) with
  // u = Σ t·D² accumulating exactly in DECIMAL(38,0) (headroom to
  // ~10³-scale corpora; the assembled T is one double division).
  // Verdict vs the asymptotic 5% point of the limiting ω²
  // distribution, 0.46136 (Anderson & Darling 1952 table; ties make
  // it approximate, as with every EDF asymptotic).
  // nullif per the cliffsDelta6 note: empty-group n1·n2·N² = 0.
  private val cvmT =
    """(CAST(u AS DOUBLE) / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |  * CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE), 0))""".stripMargin
  private val cvmSelect = Seq("n1", "n2",
    s"floor(($cvmT)*1e6 + 0.5)/1e6 AS cvm_t",
    s"(($cvmT) > 0.46136E0) AS reject_same_dist_5pct")

  /** Generic two-sample CvM core over (value, group-1 indicator) —
    * the KS grid + one multi-weight prefix-sum pass; u = Σ t·D² is
    * exact DECIMAL before the single double division. */
  private[graft] def cvmTestOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    val u = graft.util.DistRank.globalPrefixSums(v,
        Seq("ba" -> col("a"), "bb" -> col("b")), col("x"))
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST(a + b AS DECIMAL(38,0))
          | * ((ba + a)*n2 - (bb + b)*n1)
          | * ((ba + a)*n2 - (bb + b)*n1)""".stripMargin).as("term"))
      .agg(sum(col("term")).as("u"))
    u.crossJoin(broadcast(tot)).selectExpr(cvmSelect: _*)
  }

  private def cvmTest(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    cvmTestOn(p, col("x"), col("i1") === 1)
  }

  private val cvmOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
       |    CAST(sum(1 - i1) AS BIGINT) AS b
       |  FROM pooled GROUP BY x),
       |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |  CAST(sum(b) AS BIGINT) AS n2 FROM v),
       |d AS (
       |  SELECT a, b,
       |    CAST(sum(a) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
       |    CAST(sum(b) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
       |  FROM v),
       |m AS (
       |  SELECT sum(CAST(a + b AS DECIMAL(38,0))
       |    * (ca*(SELECT n2 FROM tot) - cb*(SELECT n1 FROM tot))
       |    * (ca*(SELECT n2 FROM tot) - cb*(SELECT n1 FROM tot))) AS u
       |  FROM d)
       |SELECT ${cvmSelect.mkString(",\n  ")}
       |FROM m CROSS JOIN tot""".stripMargin

  // ---- agg_anderson_darling -------------------------------------------
  // Two-sample Anderson–Darling: the TAIL-WEIGHTED member completing
  // the EDF family (KS = sup gap, CvM = integrated square, W₁ = area,
  // AD = CvM reweighted by 1/(F(1−F)) — the weight diverges at the
  // tails, where KS/CvM are blind). Pettitt 1976 / Scholz–Stephens
  // 1987 (k = 2, right-continuous EDF over distinct pooled values):
  //   A² = (1/(n₁n₂)) Σ_{B<N} t·D² / (B·(N−B))
  // with t the value's multiplicity, B the pooled inclusive
  // cumulative count, and D = ca·n₂ − cb·n₁ the SAME exact integer
  // the KS row maximizes and the CvM row squares — a third consumer
  // of the one multi-weight prefix-sum grid. Per-term doubles are
  // identical on both engines (exact DECIMAL numerator and exact
  // integer-product denominator, one division each); only the sum
  // order differs, absorbed by the 6-dp floor (the survival-KM
  // class of determinism). The B = N grid row nulls via nullif (its
  // numerator is 0 anyway) and sum skips it — on both engines.
  // Verdict vs the asymptotic 5% point 2.492 of the limiting A²
  // distribution (Anderson & Darling 1954 table; ties make it
  // approximate, as with every EDF asymptotic).
  // coalesce: a single-distinct-value pool nulls every term (B = N on
  // the only grid row), and A² is genuinely 0 there — the w1Expr rule.
  private val adExpr =
    """(coalesce(s, 0.0E0) / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0))"""
  private val adSelect = Seq("n1", "n2",
    s"floor(($adExpr)*1e6 + 0.5)/1e6 AS ad_a2",
    s"(floor(($adExpr)*1e6 + 0.5)/1e6 > 2.492E0) AS reject_same_dist_5pct")

  /** Generic two-sample AD core over (value, group-1 indicator) —
    * the KS/CvM grid + the same one multi-weight prefix-sum pass;
    * the [[graft.Graft.andersonDarling]] facade surface. */
  private[graft] def adTestOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    val s0 = graft.util.DistRank.globalPrefixSums(v,
        Seq("ba" -> col("a"), "bb" -> col("b")), col("x"))
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST(CAST(a + b AS DECIMAL(38,0))
          | * ((ba + a)*n2 - (bb + b)*n1)
          | * ((ba + a)*n2 - (bb + b)*n1) AS DOUBLE)
          | / nullif(CAST(ba + a + bb + b AS DOUBLE)
          |   * CAST((n1 + n2) - (ba + a + bb + b) AS DOUBLE), 0)""".stripMargin)
        .as("term"))
      .agg(sum(col("term")).as("s"))
    s0.crossJoin(broadcast(tot)).selectExpr(adSelect: _*)
  }

  private def adTest(s: SparkSession, dir: String): DataFrame = {
    val p = pooled(s, dir)
    adTestOn(p, col("x"), col("i1") === 1)
  }

  private val adOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
       |    CAST(sum(1 - i1) AS BIGINT) AS b
       |  FROM pooled GROUP BY x),
       |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |  CAST(sum(b) AS BIGINT) AS n2 FROM v),
       |d AS (
       |  SELECT a, b,
       |    CAST(sum(a) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
       |    CAST(sum(b) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
       |  FROM v),
       |m AS (
       |  SELECT sum(
       |    CAST(CAST(a + b AS DECIMAL(38,0))
       |      * (ca*(SELECT n2 FROM tot) - cb*(SELECT n1 FROM tot))
       |      * (ca*(SELECT n2 FROM tot) - cb*(SELECT n1 FROM tot)) AS DOUBLE)
       |    / nullif(CAST(ca + cb AS DOUBLE)
       |      * CAST(((SELECT n1 FROM tot) + (SELECT n2 FROM tot)) - (ca + cb) AS DOUBLE), 0)) AS s
       |  FROM d)
       |SELECT ${adSelect.mkString(",\n  ")}
       |FROM m CROSS JOIN tot""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mann_whitney" -> (mannWhitney _),
    "agg_ks_test" -> (ksTest _),
    "agg_cliffs_delta" -> (cliffsDelta _),
    "agg_cvm_test" -> (cvmTest _),
    "agg_anderson_darling" -> (adTest _)
  )

  val oracle: Map[String, String] = Map(
    "agg_mann_whitney" -> mannWhitneyOracle,
    "agg_ks_test" -> ksOracle,
    "agg_cliffs_delta" -> cliffsDeltaOracle,
    "agg_cvm_test" -> cvmOracle,
    "agg_anderson_darling" -> adOracle
  )
}
