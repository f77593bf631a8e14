package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.71 (round-25 batch 4) — rank correlation, the
  * missing third of the correlation family (`agg_corr_matrix` is
  * Pearson on raw values; `win_mann_kendall` is a TREND test against
  * time, not an X-Y association):
  *
  *  - [[spearmanRho]]: Spearman's ρ between per-customer order count
  *    and total spend — Pearson on average ranks, the monotone
  *    association robust to the spend distribution's heavy tail.
  *
  *  - [[kendallTauB]]: Kendall's τ-b between lineitem quantity and
  *    discount — concordant/discordant pair counting with the
  *    tie-adjusted denominator.
  *
  * Scale shapes: Spearman ranks BOTH variables on their DISTINCT
  * value axes via [[graft.util.DistRank.globalPrefixSum]] (the
  * entity-sized spend axis never sees a single-partition window),
  * joins the two rank maps back by value (keyed shuffle joins — the
  * rank maps are value-distinct and can exceed any broadcast gate),
  * and reduces to ONE five-moment hash aggregate. Kendall exploits
  * the BOUNDED value grid (≤50 quantities × ≤11 discount cents):
  * the O(n²) pair count collapses to one groupBy onto ≤550 cells,
  * a cell×cell self-join of two 550-row relations (forced broadcast
  * is safe here — the grid is bounded by the VALUE DOMAIN, not the
  * row count), and marginal tie sums.
  *
  * Determinism: doubled average ranks are exact BIGINTs; every
  * moment that is O(n²) or worse (Σr², Σr_x·r_y, Σ n_i·n_j,
  * Σ t(t−1)) accumulates in DECIMAL(38,0) (§1.5 r9) with the
  * oracle's VARCHAR routing (§1.5 r7); ρ/τ assemble once from shared
  * formula text with n-degree products widened to DOUBLE
  * pre-multiply; verdicts compare after the 6-dp floor.
  */
object Composite55 {

  // ---- agg_spearman_rho ----------------------------------------------
  // ρ = (n·Σab − Σa·Σb) / sqrt((n·Σa² − (Σa)²)(n·Σb² − (Σb)²)) on
  // DOUBLED ranks (the factor 2 cancels); z = ρ·√(n−1) against the
  // two-sided 5% normal.
  private val spR =
    """((CAST(n AS DOUBLE)*sab - sa*sb)
      | / nullif(sqrt((CAST(n AS DOUBLE)*saa - sa*sa)
      |   * (CAST(n AS DOUBLE)*sbb - sb*sb)), 0))""".stripMargin
  private val spRF = s"floor(($spR)*1e6 + 0.5)/1e6"
  private val spZF =
    s"floor((($spR) * sqrt(CAST(n AS DOUBLE) - 1))*1e6 + 0.5)/1e6"

  /** Average rank (doubled) of each distinct value of `v`, keyed by
    * value — one grouped axis + the two-pass distributed prefix sum. */
  private def rankMap(rows: DataFrame, v: String): DataFrame = {
    val vc = rows.groupBy(col(v)).agg(count(lit(1)).as("cnt"))
    graft.util.DistRank.globalPrefixSum(vc, "below", col(v), col("cnt"))
      .select(col(v), (lit(2L) * col("below") + col("cnt") + 1L).as(s"r_$v"))
  }

  private[graft] def spearmanOn(orders: DataFrame): DataFrame = {
    val base = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        sum((money(col("o_totalprice")) * 100).cast("bigint")).as("y"))
      .localCheckpoint()
    val ranked = base
      .join(rankMap(base, "x"), "x")
      .join(rankMap(base, "y"), "y")
    ranked.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(r_x AS DECIMAL(19,0))")).cast("double").as("sa"),
        sum(expr("CAST(r_y AS DECIMAL(19,0))")).cast("double").as("sb"),
        sum(expr("CAST(r_x AS DECIMAL(19,0)) * CAST(r_x AS DECIMAL(19,0))"))
          .cast("double").as("saa"),
        sum(expr("CAST(r_y AS DECIMAL(19,0)) * CAST(r_y AS DECIMAL(19,0))"))
          .cast("double").as("sbb"),
        sum(expr("CAST(r_x AS DECIMAL(19,0)) * CAST(r_y AS DECIMAL(19,0))"))
          .cast("double").as("sab"))
      .selectExpr("n AS n_customers",
        s"$spRF AS spearman_rho",
        s"$spZF AS z_stat",
        s"(abs($spZF) > 1.959964) AS reject_independence_5pct")
  }

  private def spearmanRho(s: SparkSession, dir: String): DataFrame =
    spearmanOn(load(s, dir, "orders"))

  private val spearmanOracle =
    s"""WITH base AS (
       |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |rx AS (
       |  SELECT x, 2*(CAST(sum(cnt) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - cnt) + cnt + 1 AS r_x
       |  FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt
       |        FROM base GROUP BY 1)),
       |ry AS (
       |  SELECT y, 2*(CAST(sum(cnt) OVER (ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - cnt) + cnt + 1 AS r_y
       |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt
       |        FROM base GROUP BY 1)),
       |ranked AS (
       |  SELECT r_x, r_y FROM base
       |  JOIN rx USING (x) JOIN ry USING (y)),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(CAST(sum(CAST(r_x AS DECIMAL(19,0))) AS VARCHAR)
       |      AS DOUBLE) AS sa,
       |    CAST(CAST(sum(CAST(r_y AS DECIMAL(19,0))) AS VARCHAR)
       |      AS DOUBLE) AS sb,
       |    CAST(CAST(sum(CAST(r_x AS DECIMAL(19,0))
       |      * CAST(r_x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS saa,
       |    CAST(CAST(sum(CAST(r_y AS DECIMAL(19,0))
       |      * CAST(r_y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sbb,
       |    CAST(CAST(sum(CAST(r_x AS DECIMAL(19,0))
       |      * CAST(r_y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sab
       |  FROM ranked)
       |SELECT n AS n_customers,
       |  $spRF AS spearman_rho,
       |  $spZF AS z_stat,
       |  (abs($spZF) > 1.959964) AS reject_independence_5pct
       |FROM g""".stripMargin

  // ---- agg_kendall_tau_b ------------------------------------------------
  // τ-b = (C − D) / sqrt((n0 − n1)(n0 − n2)), n0 = n(n−1)/2,
  // n1/n2 = Σ t(t−1)/2 over the x/y marginals; z via the standard
  // normal approximation 3(C−D)/sqrt(n(n−1)(2n+5)/2).
  private val ktTau =
    """((cc - dd)
      | / nullif(sqrt((CAST(n AS DOUBLE)*(n - 1)/2 - t1/2)
      |   * (CAST(n AS DOUBLE)*(n - 1)/2 - t2/2)), 0))""".stripMargin
  private val ktTauF = s"floor(($ktTau)*1e6 + 0.5)/1e6"
  private val ktZF =
    """floor(((3*(cc - dd)
      | / nullif(sqrt(CAST(n AS DOUBLE)*(n - 1)*(2*n + 5)/2), 0)))*1e6
      | + 0.5)/1e6""".stripMargin

  private[graft] def kendallOn(lineitem: DataFrame): DataFrame = {
    val cells = lineitem
      .select(col("l_quantity").cast("bigint").as("q"),
        (money(col("l_discount")) * 100).cast("bigint").as("d"))
      .groupBy(col("q"), col("d")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // cell×cell: ≤ (|quantities|·|discounts|)² comparisons — value-
    // domain-bounded, so the forced broadcast is safe at any SF.
    // coalesce-to-0: with no cross-q pairs at all (degenerate single-
    // quantity input) the join is empty and a bare sum would NULL
    // cc/dd — but zero concordant/discordant pairs IS the honest
    // value (z = 0), so both engines coalesce (scalacheck-found).
    val pairs = cells.as("a")
      .join(broadcast(cells.as("b")), col("a.q") < col("b.q"))
      .groupBy()
      .agg(
        coalesce(sum(when(col("a.d") < col("b.d"),
          expr("CAST(a.cnt AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).cast("double"),
          lit(0.0)).as("cc"),
        coalesce(sum(when(col("a.d") > col("b.d"),
          expr("CAST(a.cnt AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).cast("double"),
          lit(0.0)).as("dd"))
    // tie sums over the two marginals (t1 = x, t2 = y)
    val tq = cells.groupBy(col("q")).agg(sum(col("cnt")).as("tq"))
      .agg(sum(expr("CAST(tq AS DECIMAL(19,0)) * (tq - 1)"))
        .cast("double").as("t1"))
    val td = cells.groupBy(col("d")).agg(sum(col("cnt")).as("td"))
      .agg(sum(expr("CAST(td AS DECIMAL(19,0)) * (td - 1)"))
        .cast("double").as("t2"))
    val n = cells.agg(sum(col("cnt")).as("n"))
    pairs.crossJoin(broadcast(n)).crossJoin(broadcast(tq))
      .crossJoin(broadcast(td))
      .selectExpr("n AS n_rows",
        s"$ktTauF AS kendall_tau_b",
        s"$ktZF AS z_stat",
        s"(abs($ktZF) > 1.959964) AS reject_independence_5pct")
  }

  private def kendallTauB(s: SparkSession, dir: String): DataFrame =
    kendallOn(load(s, dir, "lineitem"))

  private val kendallOracle =
    s"""WITH cells AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS q,
       |    CAST(CAST(l_discount AS DECIMAL(15,2))*100 AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem GROUP BY 1, 2),
       |p AS (
       |  SELECT
       |    coalesce(CAST(CAST(sum(CASE WHEN a.d < b.d THEN
       |      CAST(a.cnt AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))
       |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS VARCHAR) AS DOUBLE), 0)
       |      AS cc,
       |    coalesce(CAST(CAST(sum(CASE WHEN a.d > b.d THEN
       |      CAST(a.cnt AS DECIMAL(19,0)) * CAST(b.cnt AS DECIMAL(19,0))
       |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS VARCHAR) AS DOUBLE), 0)
       |      AS dd
       |  FROM cells a JOIN cells b ON a.q < b.q),
       |tqx AS (
       |  SELECT CAST(CAST(sum(CAST(tq AS DECIMAL(19,0)) * (tq - 1))
       |    AS VARCHAR) AS DOUBLE) AS t1
       |  FROM (SELECT CAST(sum(cnt) AS BIGINT) AS tq
       |        FROM cells GROUP BY q)),
       |tdy AS (
       |  SELECT CAST(CAST(sum(CAST(td AS DECIMAL(19,0)) * (td - 1))
       |    AS VARCHAR) AS DOUBLE) AS t2
       |  FROM (SELECT CAST(sum(cnt) AS BIGINT) AS td
       |        FROM cells GROUP BY d)),
       |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells)
       |SELECT n AS n_rows,
       |  $ktTauF AS kendall_tau_b,
       |  $ktZF AS z_stat,
       |  (abs($ktZF) > 1.959964) AS reject_independence_5pct
       |FROM p CROSS JOIN nn CROSS JOIN tqx CROSS JOIN tdy""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_spearman_rho" -> (spearmanRho _),
    "agg_kendall_tau_b" -> (kendallTauB _)
  )

  val oracle: Map[String, String] = Map(
    "agg_spearman_rho" -> spearmanOracle,
    "agg_kendall_tau_b" -> kendallOracle
  )
}
