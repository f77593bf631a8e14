package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.89 (round-17 batch 2) — distribution distance and
  * robust means on the two-sample value grid, both consumers of the
  * round's distributed order-statistics toolkit
  * ([[graft.util.DistRank.globalPrefixSums]] for cumulative counts,
  * the new [[graft.util.DistRank.globalLead]] for the successor
  * value — no single-partition stage anywhere):
  *
  *  - `agg_wasserstein_distance`: the 1-Wasserstein (earth mover's)
  *    distance between the AUTOMOBILE and HOUSEHOLD acctbal EDFs —
  *    the MAGNITUDE companion of the EDF test family (`agg_ks_test`
  *    = sup gap, `agg_cvm_test` = integrated square, W₁ = the area
  *    between the curves, in dollars). W₁ = ∫│F₁−F₂│dx = Σ_grid
  *    │ca·n₂ − cb·n₁│·(next_x − x) / (n₁·n₂) over cents — the same
  *    exact integer D the KS/CvM rows use, times the exact cent gap
  *    to the next distinct value, summed in DECIMAL(38,0); ONE
  *    double division at the end.
  *
  *  - `agg_trimmed_winsorized_mean`: 10% trimmed and winsorized
  *    means of the pooled slice — the robust-location staple beside
  *    `agg_weighted_median`. Order statistics BY COUNTING on the
  *    grid: with inclusive cumulative count c, a value with t rows
  *    contributes max(0, min(c, n−k) − max(c−t, k)) rows to the
  *    trimmed core (k = n div 10 per side); the winsorized mean adds
  *    k copies of the (k+1)-th and (n−k)-th order statistics, each
  *    found as min(x │ c ≥ bound) — never a global sort through one
  *    task. Exact integer cents until the final divisions.
  */
object Composite76 {

  // ---- agg_wasserstein_distance --------------------------------------

  // nullif: empty-group n1·n2 = 0 — NULL on both engines rather than
  // Spark-4-ANSI DIVIDE_BY_ZERO vs DuckDB inf (double-div-zero
  // discipline; unreachable on the pinned slice, hardening the
  // generic *On seam — ADVICE r17).
  private val w1Expr =
    """(CAST(coalesce(u, 0) AS DOUBLE)
      |  / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 100.0E0, 0))""".stripMargin
  private val w1Select = Seq("n1", "n2",
    s"floor(($w1Expr)*1e6 + 0.5)/1e6 AS wasserstein_1")

  /** Generic W₁ core over (value, group-1 indicator); value is
    * converted to exact cents. */
  private[graft] def wassersteinOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select((money(valueCol) * 100).cast("bigint").as("xc"),
        isGroup1.cast("int").as("i1"))
      .groupBy("xc")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    val tot = v.agg(sum(col("a")).cast("bigint").as("n1"),
      sum(col("b")).cast("bigint").as("n2"))
    // Fused prefix-sums + successor: ONE range exchange and ONE
    // Window node instead of composing the two standalone primitives
    // (which would re-range-partition the full grid a second time).
    val led = graft.util.DistRank.globalPrefixSumsWithLead(v,
      Seq("ba" -> col("a"), "bb" -> col("b")), col("xc"), "xn")
    val u = led.crossJoin(broadcast(tot))
      .filter(col("xn").isNotNull)
      .select(expr(
        """CAST(abs((ba + a)*n2 - (bb + b)*n1) AS DECIMAL(38,0))
          | * (xn - xc)""".stripMargin).as("term"))
      .agg(sum(col("term")).as("u"))
    u.crossJoin(broadcast(tot)).selectExpr(w1Select: _*)
  }

  private def wasserstein(s: SparkSession, dir: String): DataFrame = {
    val p = Composite8.pooled(s, dir)
    wassersteinOn(p, col("x"), col("i1") === 1)
  }

  private val wassersteinOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT CAST(CAST(x AS DECIMAL(15,2))*100 AS BIGINT) AS xc,
       |    CAST(sum(i1) AS BIGINT) AS a,
       |    CAST(sum(1 - i1) AS BIGINT) AS b
       |  FROM pooled GROUP BY 1),
       |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |  CAST(sum(b) AS BIGINT) AS n2 FROM v),
       |d AS (
       |  SELECT xc, a, b,
       |    CAST(sum(a) OVER (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
       |    CAST(sum(b) OVER (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
       |    lead(xc) OVER (ORDER BY xc) AS xn
       |  FROM v),
       |m AS (
       |  SELECT sum(CAST(abs(ca*(SELECT n2 FROM tot) - cb*(SELECT n1 FROM tot)) AS DECIMAL(38,0))
       |    * (xn - xc)) AS u
       |  FROM d WHERE xn IS NOT NULL)
       |SELECT ${w1Select.mkString(",\n  ")}
       |FROM m CROSS JOIN tot""".stripMargin

  // ---- agg_trimmed_winsorized_mean -------------------------------------

  private val trimmedSelect = Seq("n", "k AS k_trim",
    """floor((CAST(tsum AS DOUBLE)
      |  / (CAST(nullif(n - 2*k, 0) AS DOUBLE) * 100.0E0))*1e6 + 0.5)/1e6
      |  AS trimmed_mean""".stripMargin,
    """floor(((CAST(tsum AS DOUBLE)
      |  + CAST(k AS DOUBLE)*CAST(lo AS DOUBLE)
      |  + CAST(k AS DOUBLE)*CAST(hi AS DOUBLE))
      |  / (CAST(n AS DOUBLE) * 100.0E0))*1e6 + 0.5)/1e6
      |  AS winsorized_mean""".stripMargin)

  /** Generic trimmed/winsorized-mean core over a value column
    * (exact-cents conversion inside). */
  private[graft] def trimmedWinsorizedOn(df: DataFrame,
      valueCol: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select((money(valueCol) * 100).cast("bigint").as("xc"))
      .groupBy("xc").agg(count(lit(1)).as("t"))
    val tot = v.agg(sum(col("t")).cast("bigint").as("n"))
      .selectExpr("n", "CAST((n - (n % 10)) / 10 AS BIGINT) AS k")
    val pre = graft.util.DistRank
      .globalPrefixSum(v, "below", col("xc"), col("t"))
      .crossJoin(broadcast(tot))
      .select(col("xc"), col("t"), (col("below") + col("t")).as("c"),
        col("n"), col("k"))
      .localCheckpoint() // three consumers: core sum, lo, hi
    val sums = pre.select(expr(
        """CAST(xc AS DECIMAL(38,0))
          | * greatest(0, least(c, n - k) - greatest(c - t, k))""".stripMargin)
        .as("ts"))
      .agg(sum(col("ts")).as("tsum"))
    val lo = pre.filter(col("c") >= col("k") + 1)
      .agg(min(col("xc")).as("lo"))
    val hi = pre.filter(col("c") >= col("n") - col("k"))
      .agg(min(col("xc")).as("hi"))
    sums.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .crossJoin(broadcast(tot))
      .selectExpr(trimmedSelect: _*)
  }

  private def trimmedWinsorized(s: SparkSession, dir: String): DataFrame = {
    val p = Composite8.pooled(s, dir)
    trimmedWinsorizedOn(p, col("x"))
  }

  private val trimmedOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT CAST(CAST(x AS DECIMAL(15,2))*100 AS BIGINT) AS xc,
       |    CAST(count(*) AS BIGINT) AS t
       |  FROM pooled GROUP BY 1),
       |tot AS (
       |  SELECT n, CAST((n - (n % 10)) / 10 AS BIGINT) AS k
       |  FROM (SELECT CAST(sum(t) AS BIGINT) AS n FROM v)),
       |pre AS (
       |  SELECT xc, t,
       |    CAST(sum(t) OVER (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c,
       |    (SELECT n FROM tot) AS n, (SELECT k FROM tot) AS k
       |  FROM v),
       |s AS (
       |  SELECT sum(CAST(xc AS DECIMAL(38,0))
       |    * greatest(0, least(c, n - k) - greatest(c - t, k))) AS tsum
       |  FROM pre),
       |lo AS (SELECT min(xc) AS lo FROM pre WHERE c >= k + 1),
       |hi AS (SELECT min(xc) AS hi FROM pre WHERE c >= n - k)
       |SELECT ${trimmedSelect.mkString(",\n  ")}
       |FROM s CROSS JOIN lo CROSS JOIN hi CROSS JOIN tot""".stripMargin

  // ---- agg_brunner_munzel ----------------------------------------------
  // Brunner–Munzel generalized Wilcoxon: the modern default when the
  // two samples may differ in SHAPE/variance (Mann–Whitney assumes
  // exchangeability under H0; BM tests P(X<Y)+½P(X=Y) = ½ without
  // it). W = n₁n₂·(R̄₂−R̄₁) / ((n₁+n₂)·√(n₁S₁²+n₂S₂²)) with
  // Sᵢ² the variance of (overall − within-group) midranks, plus the
  // Welch–Satterthwaite df and the common-language p̂ estimate.
  // Verdict via the large-sample normal 5% quantile (the exact
  // small-sample BM test reads t_df — df is surfaced for it).
  //
  // Everything reduces to exact integers on the value grid: with
  // prefix counts ba/bb, group-1 rows at a value have DOUBLED
  // rank deviation 2d₁ = 2·bb + b (the overall-minus-within midrank
  // difference; 2d₂ = 2·ba + a), and the doubled overall midrank is
  // tm = 2(ba+bb) + (a+b) + 1 — so the six moments (s, q, r per
  // group) are exact BIGINT/DECIMAL sums and the statistic assembles
  // once in shared text. Formula verified against the published
  // reference case (W = 3.137467, df = 17.682842 — the Brunner &
  // Munzel 2000 design, the planted spec).
  // Every zero-able denominator below rides nullif (empty group n_i=0,
  // singleton n_i=1): Spark 4 ANSI raises DIVIDE_BY_ZERO on doubles
  // where DuckDB returns inf/nan — ADVICE r17 seam hardening.
  private def bmS(i: Int) =
    s"""((CAST(q$i AS DOUBLE) - CAST(s$i AS DOUBLE)*CAST(s$i AS DOUBLE)/nullif(CAST(n$i AS DOUBLE), 0))
       | / nullif(4.0E0*(CAST(n$i AS DOUBLE) - 1), 0))""".stripMargin
  private val bmVsum =
    s"(CAST(n1 AS DOUBLE)*${bmS(1)} + CAST(n2 AS DOUBLE)*${bmS(2)})"
  private val bmDiff =
    """((CAST(r2s AS DOUBLE)/nullif(CAST(n2 AS DOUBLE), 0)
      |  - CAST(r1s AS DOUBLE)/nullif(CAST(n1 AS DOUBLE), 0))/2.0E0)""".stripMargin
  private val bmW =
    s"""(CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)*$bmDiff
       | / nullif(CAST(n1 + n2 AS DOUBLE)*sqrt($bmVsum), 0))""".stripMargin
  private val bmPhat =
    """((CAST(r2s AS DOUBLE)/nullif(CAST(n2 AS DOUBLE), 0)/2.0E0
      |  - (CAST(n2 AS DOUBLE) + 1)/2.0E0)/nullif(CAST(n1 AS DOUBLE), 0))""".stripMargin
  private val bmDf =
    s"""(($bmVsum)*($bmVsum)
       | / nullif((CAST(n1 AS DOUBLE)*${bmS(1)})*(CAST(n1 AS DOUBLE)*${bmS(1)})/nullif(CAST(n1 AS DOUBLE) - 1, 0)
       |   + (CAST(n2 AS DOUBLE)*${bmS(2)})*(CAST(n2 AS DOUBLE)*${bmS(2)})/nullif(CAST(n2 AS DOUBLE) - 1, 0), 0))""".stripMargin
  private val bmSelect = Seq("n1", "n2",
    s"floor(($bmPhat)*1e6 + 0.5)/1e6 AS p_hat",
    s"floor(($bmW)*1e6 + 0.5)/1e6 AS w_stat",
    s"floor(($bmDf)*1e6 + 0.5)/1e6 AS df",
    s"(abs($bmW) > 1.959964) AS reject_5pct")

  /** Generic BM core over (value, group-1 indicator). */
  private[graft] def brunnerMunzelOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select(valueCol.as("x"), isGroup1.cast("int").as("i1"))
      .groupBy("x")
      .agg(sum(col("i1")).cast("bigint").as("a"),
        sum(lit(1) - col("i1")).cast("bigint").as("b"))
    graft.util.DistRank.globalPrefixSums(v,
        Seq("ba" -> col("a"), "bb" -> col("b")), col("x"))
      .selectExpr("a", "b",
        "2*bb + b AS d1", "2*ba + a AS d2",
        "2*(ba + bb) + (a + b) + 1 AS tm")
      .agg(
        sum(col("a")).cast("bigint").as("n1"),
        sum(col("b")).cast("bigint").as("n2"),
        sum(expr("a * d1")).cast("bigint").as("s1"),
        sum(expr("CAST(a AS DECIMAL(38,0)) * d1 * d1")).as("q1"),
        sum(expr("b * d2")).cast("bigint").as("s2"),
        sum(expr("CAST(b AS DECIMAL(38,0)) * d2 * d2")).as("q2"),
        sum(expr("CAST(a AS DECIMAL(38,0)) * tm")).as("r1s"),
        sum(expr("CAST(b AS DECIMAL(38,0)) * tm")).as("r2s"))
      .selectExpr(bmSelect: _*)
  }

  private def brunnerMunzel(s: SparkSession, dir: String): DataFrame = {
    val p = Composite8.pooled(s, dir)
    brunnerMunzelOn(p, col("x"), col("i1") === 1)
  }

  private val brunnerMunzelOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT x, CAST(sum(i1) AS BIGINT) AS a,
       |    CAST(sum(1 - i1) AS BIGINT) AS b
       |  FROM pooled GROUP BY x),
       |p AS (
       |  SELECT a, b,
       |    CAST(sum(a) OVER w AS BIGINT) - a AS ba,
       |    CAST(sum(b) OVER w AS BIGINT) - b AS bb
       |  FROM v
       |  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |g AS (
       |  SELECT a, b, 2*bb + b AS d1, 2*ba + a AS d2,
       |    2*(ba + bb) + (a + b) + 1 AS tm
       |  FROM p),
       |m AS (
       |  SELECT CAST(sum(a) AS BIGINT) AS n1,
       |    CAST(sum(b) AS BIGINT) AS n2,
       |    CAST(sum(a * d1) AS BIGINT) AS s1,
       |    sum(CAST(a AS DECIMAL(38,0)) * d1 * d1) AS q1,
       |    CAST(sum(b * d2) AS BIGINT) AS s2,
       |    sum(CAST(b AS DECIMAL(38,0)) * d2 * d2) AS q2,
       |    sum(CAST(a AS DECIMAL(38,0)) * tm) AS r1s,
       |    sum(CAST(b AS DECIMAL(38,0)) * tm) AS r2s
       |  FROM g)
       |SELECT ${bmSelect.mkString(",\n  ")}
       |FROM m""".stripMargin

  // ---- registration ---------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_wasserstein_distance" -> (wasserstein _),
    "agg_trimmed_winsorized_mean" -> (trimmedWinsorized _),
    "agg_brunner_munzel" -> (brunnerMunzel _)
  )

  val oracle: Map[String, String] = Map(
    "agg_wasserstein_distance" -> wassersteinOracle,
    "agg_trimmed_winsorized_mean" -> trimmedOracle,
    "agg_brunner_munzel" -> brunnerMunzelOracle
  )
}
