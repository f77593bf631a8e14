package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.90 (round-18 batch 3) — robust dispersion, histogram
  * overlap, and nonparametric change-point detection:
  *
  *  - `agg_gini_mean_diff`: the Gini mean difference E|X−X'| of the
  *    pooled acctbal slice — the robust dispersion companion of
  *    `agg_trimmed_winsorized_mean` (GMD is more efficient than the
  *    standard deviation under heavy tails, and is the absolute
  *    version of the Gini machinery without a positivity
  *    requirement). Never the O(n²) pair materialization: on the
  *    (cents, count) grid, Σ_{i<j}(x_j − x_i) = Σ_k x_k·t_k·
  *    (2·below_k + t_k − n) with `below` from ONE
  *    [[graft.util.DistRank.globalPrefixSum]] pass — exact
  *    DECIMAL(38,0) until the single double division.
  *  - `agg_bhattacharyya_overlap`: Bhattacharyya coefficient,
  *    Hellinger distance, and the overlap coefficient between the two
  *    slices' 16-bin equal-width histograms — the DISTRIBUTION-SHAPE
  *    overlap summary beside the EDF verdict family (KS & co. say
  *    whether the distributions differ; BC/OVL say how much mass
  *    they share). Integer binning ((xc − mn)·16 div (mx − mn + 1) —
  *    exact on both engines), per-bin shares are exact rationals,
  *    √(p·q) is an identical-input libm call, the 16-term sums are
  *    6-dp-rounded (survival-KM class); Hellinger clamps 1 − BC at 0
  *    before the sqrt so fp residue cannot produce NaN.
  *  - `evt_pettitt_changepoint`: Pettitt's nonparametric change-point
  *    test per event type over the daily count series — WHERE the
  *    level shifted, beside `evt_cusum_drift`'s monitoring view and
  *    `win_mann_kendall`'s monotone-trend verdict. The O(T²) pair
  *    statistic collapses to ranks: V_i = Σ_j sgn(x_i − x_j) =
  *    2(rmin−1) + t − T per day (exact midrank identity), and
  *    U_t = Σ_{i≤t} V_i is ONE type-partitioned cumulative window
  *    (the antisymmetric double sum over i,j ≤ t vanishes) — all
  *    windows bounded by the per-type day horizon
  *    (win_mann_kendall justification). K = max│U_t│ (t < T),
  *    change day = earliest attaining day, approximate
  *    p = min(1, 2·exp(−6K²/(T³+T²))) via identical-input exp.
  */
object Composite83 {

  // ---- agg_gini_mean_diff --------------------------------------------
  private val gmdExpr =
    """(2.0E0*CAST(d2 AS DOUBLE)
      |  / nullif(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0E0)*100.0E0, 0))""".stripMargin
  private val gmdSelect = Seq("n",
    s"floor(($gmdExpr)*1e6 + 0.5)/1e6 AS gini_mean_diff")

  /** Generic GMD core over a value column; value converted to exact
    * cents (the wassersteinOn rule). */
  private[graft] def gmdOn(df: DataFrame, valueCol: org.apache.spark.sql.Column): DataFrame = {
    val v = df.select((money(valueCol) * 100).cast("bigint").as("xc"))
      .groupBy("xc").agg(count(lit(1)).as("t"))
    val tot = v.agg(sum(col("t")).cast("bigint").as("n"))
    val d = graft.util.DistRank
      .globalPrefixSum(v, "below", col("xc"), col("t"))
      .crossJoin(broadcast(tot))
      .select(expr(
        "CAST(xc AS DECIMAL(38,0)) * t * (2*below + t - n)").as("term"))
      .agg(sum(col("term")).as("d2"))
    d.crossJoin(broadcast(tot)).selectExpr(gmdSelect: _*)
  }

  private def gmd(s: SparkSession, dir: String): DataFrame =
    gmdOn(Composite8.pooled(s, dir), col("x"))

  private val gmdOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |v AS (
       |  SELECT CAST(CAST(x AS DECIMAL(15,2))*100 AS BIGINT) AS xc,
       |    CAST(count(*) AS BIGINT) AS t
       |  FROM pooled GROUP BY 1),
       |tot AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM v),
       |p AS (
       |  SELECT xc, t,
       |    CAST(sum(t) OVER (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - t AS below
       |  FROM v),
       |m AS (
       |  SELECT sum(CAST(xc AS DECIMAL(38,0)) * t
       |    * (2*below + t - (SELECT n FROM tot))) AS d2
       |  FROM p)
       |SELECT ${gmdSelect.mkString(",\n  ")}
       |FROM m CROSS JOIN tot""".stripMargin

  // ---- agg_bhattacharyya_overlap --------------------------------------
  private val BhBins = 16L

  private val bhSelect = Seq("n1", "n2",
    s"CAST($BhBins AS BIGINT) AS n_bins",
    "round(bc, 6) AS bhattacharyya",
    "round(sqrt(greatest(0.0E0, 1.0E0 - bc)), 6) AS hellinger",
    "round(ov, 6) AS overlap_coef")

  /** Generic histogram-overlap core over (value, group-1 indicator);
    * value converted to exact cents. */
  private[graft] def bhattacharyyaOn(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      isGroup1: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select((money(valueCol) * 100).cast("bigint").as("xc"),
        isGroup1.cast("int").as("i1"))
    val mm = base.agg(min(col("xc")).as("mn"), max(col("xc")).as("mx"),
      sum(col("i1")).cast("bigint").as("n1"),
      sum(lit(1) - col("i1")).cast("bigint").as("n2"))
    val bins = base.crossJoin(broadcast(mm))
      .select(expr(s"(xc - mn)*$BhBins div (mx - mn + 1)").as("bin"),
        col("i1"))
      .groupBy(col("bin"))
      .agg(sum(col("i1")).cast("bigint").as("c1"),
        sum(lit(1) - col("i1")).cast("bigint").as("c2"))
    val sums = bins.crossJoin(broadcast(mm))
      .select(expr(
        """sqrt((CAST(c1 AS DOUBLE)/nullif(CAST(n1 AS DOUBLE), 0))
          |  * (CAST(c2 AS DOUBLE)/nullif(CAST(n2 AS DOUBLE), 0)))""".stripMargin)
        .as("bct"),
        expr(
          """least(CAST(c1 AS DOUBLE)/nullif(CAST(n1 AS DOUBLE), 0),
            |  CAST(c2 AS DOUBLE)/nullif(CAST(n2 AS DOUBLE), 0))""".stripMargin)
          .as("ovt"))
      .agg(sum(col("bct")).as("bc"), sum(col("ovt")).as("ov"))
    sums.crossJoin(broadcast(mm)).selectExpr(bhSelect: _*)
  }

  private def bhattacharyya(s: SparkSession, dir: String): DataFrame =
    bhattacharyyaOn(Composite8.pooled(s, dir), col("x"), col("i1") === 1)

  private val bhOracle =
    s"""WITH pooled AS (
       |  SELECT c_acctbal AS x,
       |    CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS i1
       |  FROM customer
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
       |base AS (
       |  SELECT CAST(CAST(x AS DECIMAL(15,2))*100 AS BIGINT) AS xc, i1
       |  FROM pooled),
       |mm AS (SELECT min(xc) AS mn, max(xc) AS mx,
       |  CAST(sum(i1) AS BIGINT) AS n1,
       |  CAST(sum(1 - i1) AS BIGINT) AS n2 FROM base),
       |bins AS (
       |  SELECT (xc - mn)*$BhBins // (mx - mn + 1) AS bin,
       |    CAST(sum(i1) AS BIGINT) AS c1,
       |    CAST(sum(1 - i1) AS BIGINT) AS c2
       |  FROM base CROSS JOIN mm GROUP BY 1),
       |s AS (
       |  SELECT
       |    sum(sqrt((CAST(c1 AS DOUBLE)/nullif(CAST(n1 AS DOUBLE), 0))
       |      * (CAST(c2 AS DOUBLE)/nullif(CAST(n2 AS DOUBLE), 0)))) AS bc,
       |    sum(least(CAST(c1 AS DOUBLE)/nullif(CAST(n1 AS DOUBLE), 0),
       |      CAST(c2 AS DOUBLE)/nullif(CAST(n2 AS DOUBLE), 0))) AS ov
       |  FROM bins CROSS JOIN mm)
       |SELECT ${bhSelect.mkString(",\n  ")}
       |FROM s CROSS JOIN mm""".stripMargin

  // ---- evt_pettitt_changepoint ----------------------------------------
  private val pettittP =
    """least(1.0E0, 2.0E0*exp(-6.0E0*CAST(k_stat AS DOUBLE)*CAST(k_stat AS DOUBLE)
      |  / (CAST(n_days AS DOUBLE)*CAST(n_days AS DOUBLE)*CAST(n_days AS DOUBLE)
      |     + CAST(n_days AS DOUBLE)*CAST(n_days AS DOUBLE))))""".stripMargin
  private val pettittSelect = Seq("event_type", "n_days", "k_stat",
    "change_dd",
    s"floor(($pettittP)*1e6 + 0.5)/1e6 AS p_approx",
    s"($pettittP < 0.05E0) AS change_detected_5pct")

  private[graft] def pettittOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("bigint").as("dd"))
      .groupBy(col("event_type"), col("dd"))
      .agg(count(lit(1)).as("y"))
    val byType = Window.partitionBy(col("event_type"))
    val ranked = daily
      .withColumn("tt", count(lit(1)).over(byType))
      .withColumn("rmin", rank().over(byType.orderBy(col("y"))).cast("long"))
      .withColumn("tw", count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("y"))))
      .select(col("event_type"), col("dd"), col("tt"),
        (lit(2L) * (col("rmin") - 1L) + col("tw") - col("tt")).as("v"))
    val u = ranked
      .withColumn("u", sum(col("v")).over(byType.orderBy(col("dd"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx", row_number().over(byType.orderBy(col("dd"))))
      .filter(col("idx") < col("tt")) // U_T ≡ 0, excluded by convention
      .localCheckpoint(false) // feeds the max AND the argmax join
    val k = u.groupBy(col("event_type"))
      .agg((max(col("tt")) /* constant per type */).as("nd"),
        max(abs(col("u"))).as("k_stat"))
    val at = u.join(broadcast(k), Seq("event_type"))
      .filter(abs(col("u")) === col("k_stat"))
      .groupBy(col("event_type")).agg(min(col("dd")).as("change_dd"))
    k.join(at, Seq("event_type"))
      .select(col("event_type"), col("nd").as("n_days"),
        col("k_stat").cast("bigint").as("k_stat"), col("change_dd"))
      .selectExpr(pettittSelect: _*)
      .orderBy("event_type")
  }

  private def pettitt(s: SparkSession, dir: String): DataFrame =
    pettittOn(loadEvents(s, dir))

  private val pettittOracle =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dd,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |ranked AS (
       |  SELECT event_type, dd,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tt,
       |    2*(CAST(rank() OVER (PARTITION BY event_type ORDER BY y) AS BIGINT) - 1)
       |      + CAST(count(*) OVER (PARTITION BY event_type, y) AS BIGINT)
       |      - CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS v
       |  FROM daily),
       |u AS (
       |  SELECT event_type, dd, tt,
       |    CAST(sum(v) OVER (PARTITION BY event_type ORDER BY dd
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dd) AS BIGINT) AS idx
       |  FROM ranked),
       |ub AS (SELECT * FROM u WHERE idx < tt),
       |k AS (
       |  SELECT event_type, max(tt) AS n_days, max(abs(u)) AS k_stat
       |  FROM ub GROUP BY 1),
       |at AS (
       |  SELECT ub.event_type, min(ub.dd) AS change_dd
       |  FROM ub JOIN k ON ub.event_type = k.event_type
       |    AND abs(ub.u) = k.k_stat
       |  GROUP BY 1)
       |SELECT ${pettittSelect.mkString(",\n  ")}
       |FROM k JOIN at USING (event_type)
       |ORDER BY event_type""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_gini_mean_diff" -> (gmd _),
    "agg_bhattacharyya_overlap" -> (bhattacharyya _),
    "evt_pettitt_changepoint" -> (pettitt _)
  )

  val oracle: Map[String, String] = Map(
    "agg_gini_mean_diff" -> gmdOracle,
    "agg_bhattacharyya_overlap" -> bhOracle,
    "evt_pettitt_changepoint" -> pettittOracle
  )
}
