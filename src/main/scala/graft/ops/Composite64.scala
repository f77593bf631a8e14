package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.80 (round-26 batch 2) — structural-break inference
  * and seasonal smoothing:
  *
  *  - [[chowTest]]: the Chow F-test on the two-regime OLS that
  *    `evt_segmented_trend` (Composite61) fits — that row surfaces
  *    WHAT changed (slopes, jump); this one surfaces WHETHER the
  *    split model beats the pooled line at 5%:
  *    F = ((SSR_p − SSR_1 − SSR_2)/k) / ((SSR_1 + SSR_2)/(m − 2k)),
  *    k = 2 (intercept + slope), against the large-sample
  *    F(2, ∞) 5% point χ²₂/2 = 2.995732 (Fuller-table style fixed
  *    constant, documented and mirrored — per-type df₂ ≈ 26 here,
  *    where the exact point is ~3.37, so the flag is mildly
  *    anti-conservative; the f_stat column is the portable value).
  *
  *  - [[holtWinters]]: truncated ADDITIVE Holt-Winters over daily
  *    counts — `win_holt_backtest` (Composite43) smooths level +
  *    trend but is season-blind; this row adds the weekly seasonal
  *    term and backtests one-step-ahead against the SEASONAL naive
  *    (y_{t−7}), the honest baseline for seasonal data. Level/trend
  *    via 4-lag Brown double smoothing (weights 2^(3−j)/15, forecast
  *    3S1 − 2S2), seasonal index via a 2-week truncated smoothing of
  *    the detrended deviations (weights {2,1}/3 on dev_t, dev_{t−7}).
  *    Row-lag (not calendar-lag) semantics throughout, identical in
  *    the oracle — day gaps cannot diverge the engines (the
  *    Composite43 discipline; lags shrink to 4/2 because the events
  *    corpus spans 30 days per type at EVERY SF, so the 8-lag warmup
  *    would never score a row).
  *
  * Scale shapes: both are one (type, day) COUNT aggregate (map-side
  * combining over raw events) feeding per-type windows bounded by
  * |types|·|days| — never raw events — into ONE final hash
  * aggregate per type.
  *
  * Determinism: Chow moments Σt², Σt·y, Σy² accumulate in exact
  * DECIMAL (§1.5 r9) with oracle VARCHAR routing (§1.5 r7); SSRs
  * and F assemble once from staged shared formula text, with the
  * perfect-fit guard (CASE … > 0 before the ratio — the ADF
  * discipline: a few-ulp-negative SSR sum must NULL identically in
  * both engines, not explode the ratio). Holt-Winters residuals are
  * exact integers by construction (dyadic weights over /15, /225,
  * /45 scalings on one /225 grid); the only doubles are the final
  * per-type MAE divisions, floor-6.
  */
object Composite64 {

  private def dailyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))

  // ---- evt_chow_test ------------------------------------------------------
  private def chowSeg(i: Int): Seq[String] = {
    val cond = if (i == 1) "t <= t0" else "t > t0"
    Seq(
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS m$i",
      s"CAST(sum(CASE WHEN $cond THEN t ELSE 0 END) AS BIGINT) AS st$i",
      s"CAST(sum(CASE WHEN $cond THEN y ELSE 0 END) AS BIGINT) AS sy$i",
      s"""sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(19,0))
         |  * CAST(t AS DECIMAL(19,0)) ELSE CAST(0 AS DECIMAL(38,0)) END)
         |  AS stt$i""".stripMargin,
      s"""sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(19,0))
         |  * CAST(y AS DECIMAL(19,0)) ELSE CAST(0 AS DECIMAL(38,0)) END)
         |  AS sty$i""".stripMargin,
      s"""sum(CASE WHEN $cond THEN CAST(y AS DECIMAL(19,0))
         |  * CAST(y AS DECIMAL(19,0)) ELSE CAST(0 AS DECIMAL(38,0)) END)
         |  AS syy$i""".stripMargin)
  }

  // Centered second moments per regime and pooled — every input
  // exact, each quotient double (shared text). The pooled sums are
  // single additions of exact values (one IEEE op, same both sides).
  private def chowCentered(tag: String, m: String, st: String, sy: String,
      stt: String, sty: String, syy: String): Seq[String] = Seq(
    s"($stt) - CAST($st AS DOUBLE)*($st)/($m) AS cxx$tag",
    s"($sty) - CAST($st AS DOUBLE)*($sy)/($m) AS cxy$tag",
    s"($syy) - CAST($sy AS DOUBLE)*($sy)/($m) AS cyy$tag")
  private val chowStage1: Seq[String] =
    chowCentered("1", "m1", "st1", "sy1", "stt1", "sty1", "syy1") ++
    chowCentered("2", "m2", "st2", "sy2", "stt2", "sty2", "syy2") ++
    chowCentered("p", "m1 + m2", "st1 + st2", "sy1 + sy2",
      "stt1 + stt2", "sty1 + sty2", "syy1 + syy2")
  private def ssr(tag: String): String =
    s"cyy$tag - cxy$tag*cxy$tag/nullif(cxx$tag, 0) AS ssr$tag"
  private val chowStage2 = Seq(ssr("1"), ssr("2"), ssr("p"))
  // Residual-variance gate BEFORE the ratio (the ADF discipline):
  // perfect fits leave ssr1+ssr2 a few ulp either side of 0, and the
  // unguarded F would be ±huge-or-inf with the sign diverging across
  // engines. NULL m−4 (too few days) rides the same CASE to NULL.
  private val chowF =
    """(CASE WHEN (ssr1 + ssr2) / nullif(CAST(m1 + m2 AS DOUBLE) - 4, 0) > 0
      |  THEN ((ssrp - ssr1 - ssr2)/2)
      |    / ((ssr1 + ssr2) / (CAST(m1 + m2 AS DOUBLE) - 4)) END)""".stripMargin
  private val chowFF = s"floor(($chowF)*1e6 + 0.5)/1e6"
  private val chowFinal: Seq[String] = Seq(
    "event_type", "CAST(m1 + m2 AS BIGINT) AS n_days", "t0 AS cut_index",
    s"$chowFF AS f_stat",
    s"($chowFF > 2.995732) AS reject_stability_5pct")

  private[graft] def chowOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val wall = Window.partitionBy(col("event_type"))
    val cut = dailyCounts(events)
      .select(col("event_type"), col("y"),
        row_number().over(w).cast("long").as("t"))
      .withColumn("nd", count(lit(1)).over(wall))
      .withColumn("t0", expr("(nd + 1) div 2"))
    // expr() parses the "… AS name" aliases embedded in the shared
    // moment strings, so the agg list IS the oracle's agg list.
    val moments = (chowSeg(1) ++ chowSeg(2)).map(s => expr(s))
    cut.groupBy(col("event_type"))
      .agg(max(col("t0")).as("t0"), moments: _*)
      .selectExpr(Seq("event_type", "t0", "m1", "m2", "st1", "st2",
        "sy1", "sy2",
        "CAST(stt1 AS DOUBLE) AS stt1", "CAST(stt2 AS DOUBLE) AS stt2",
        "CAST(sty1 AS DOUBLE) AS sty1", "CAST(sty2 AS DOUBLE) AS sty2",
        "CAST(syy1 AS DOUBLE) AS syy1", "CAST(syy2 AS DOUBLE) AS syy2"): _*)
      .selectExpr("*" +: chowStage1: _*)
      .selectExpr("*" +: chowStage2: _*)
      .selectExpr(chowFinal: _*)
      .orderBy("event_type")
  }

  private def chowTest(s: SparkSession, dir: String): DataFrame =
    chowOn(loadEvents(s, dir))

  private val chowOracle = {
    val aggDefs = ("CAST(max(t0) AS BIGINT) AS t0" +:
      (chowSeg(1) ++ chowSeg(2))).mkString(",\n    ")
    // The decimal moment sums route through VARCHAR on the way to
    // DOUBLE (§1.5 r7 — DuckDB's HUGEINT-backed wide decimals do not
    // round-trip to double the way Spark's BigDecimal does).
    val toD = (1 to 2).flatMap(i => Seq(s"stt$i", s"sty$i", s"syy$i"))
      .map(c => s"CAST(CAST($c AS VARCHAR) AS DOUBLE) AS $c")
      .mkString(", ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT event_type, y,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
       |      AS BIGINT) AS t,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
       |  FROM daily),
       |cut AS (SELECT *, (nd + 1) // 2 AS t0 FROM idx),
       |g AS (
       |  SELECT event_type,
       |    $aggDefs
       |  FROM cut GROUP BY 1),
       |gd AS (SELECT event_type, t0, m1, m2, st1, st2, sy1, sy2, $toD
       |  FROM g),
       |s1 AS (SELECT *, ${chowStage1.mkString(", ")} FROM gd),
       |s2 AS (SELECT *, ${chowStage2.mkString(", ")} FROM s1)
       |SELECT ${chowFinal.mkString(",\n  ")}
       |FROM s2 ORDER BY event_type""".stripMargin
  }

  // ---- evt_holt_winters ---------------------------------------------------
  // Dyadic truncated weights: level stage L = 4 lags (Σ2^j = 15),
  // seasonal stage 2 weekly lags (Σ2^j = 3), season length 7 rows.
  //   n1_t  = Σ_{j=0..3} 2^(3−j)·y_{t−j}            (= 15·S1, int)
  //   n2_t  = Σ_{i=0..3} 2^(3−i)·n1_{t−i}           (= 225·S2, int)
  //   brown = 45·n1 − 2·n2                          (= 225·(3S1−2S2))
  //   dev_t = 15·y_t − n1_t                         (= 15·(y − S1))
  //   sea_t = 2·dev_t + dev_{t−7}                   (= 45·s_t, int)
  //   f_u   = (brown_{u−1} + 5·sea_{u−7}) / 225
  //   err_u = 225·y_u − brown_{u−1} − 5·sea_{u−7}   (exact BIGINT)
  // Each stage filters its warm-up NULLs and the next stage lags over
  // the SURVIVING rows (the Composite43 nested-WHERE semantics,
  // mirrored); first scored row is the 21st per type.
  private val HwLags = 4
  private val HwDen = 15L // Σ_{j=0..3} 2^j

  private[graft] def holtWintersOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    def stage(src: Column, lags: Int, step: Int): Column =
      (0 until lags).map(j =>
        lag(src, j * step).over(w) * lit(1L << (lags - 1 - j))).reduce(_ + _)
    val s1 = dailyCounts(events)
      .select(col("event_type"), col("d"), col("y"),
        stage(col("y"), HwLags, 1).as("n1"))
      .filter(col("n1").isNotNull)
    val s2 = s1
      .select(col("event_type"), col("d"), col("y"),
        (lit(15L) * col("y") - col("n1")).as("dev"),
        (lit(3L * HwDen) * col("n1") -
          lit(2L) * stage(col("n1"), HwLags, 1)).as("brown"))
      .filter(col("brown").isNotNull)
    val s3 = s2
      .select(col("event_type"), col("d"), col("y"), col("brown"),
        stage(col("dev"), 2, 7).as("sea"))
      .filter(col("sea").isNotNull)
    s3.select(col("event_type"), col("y"),
        (lag(col("brown"), 1).over(w) +
          lit(5L) * lag(col("sea"), 7).over(w)).as("pf"),
        lag(col("y"), 7).over(w).as("py7"))
      .filter(col("pf").isNotNull && col("py7").isNotNull)
      .select(col("event_type"),
        (col("y") * lit(225L) - col("pf")).as("err"),
        abs(col("y") - col("py7")).as("snaive_err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(abs(col("err"))).as("sa"),
        sum(col("err")).as("se"), sum(col("snaive_err")).as("sn"))
      .selectExpr("event_type", "n AS n_forecasts",
        "floor((CAST(sa AS DOUBLE) / 225 / n)*1e6 + 0.5)/1e6 AS hw_mae",
        "floor((CAST(se AS DOUBLE) / 225 / n)*1e6 + 0.5)/1e6 AS hw_bias",
        "floor((CAST(sn AS DOUBLE) / n)*1e6 + 0.5)/1e6 AS snaive_mae")
      .orderBy("event_type")
  }

  private def holtWinters(s: SparkSession, dir: String): DataFrame =
    holtWintersOn(loadEvents(s, dir))

  private val holtWintersOracle = {
    def stage(x: String, lags: Int, step: Int): String =
      (0 until lags).map(j =>
        (if (j == 0) x else s"lag($x, ${j * step}) OVER w") +
          s"*${1L << (lags - 1 - j)}").mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |s1 AS (
       |  SELECT * FROM (
       |    SELECT event_type, d, y, ${stage("y", HwLags, 1)} AS n1
       |    FROM daily
       |    WINDOW w AS (PARTITION BY event_type ORDER BY d))
       |  WHERE n1 IS NOT NULL),
       |s2 AS (
       |  SELECT event_type, d, y, 15*y - n1 AS dev, brown FROM (
       |    SELECT event_type, d, y, n1,
       |      45*n1 - 2*(${stage("n1", HwLags, 1)}) AS brown
       |    FROM s1
       |    WINDOW w AS (PARTITION BY event_type ORDER BY d))
       |  WHERE brown IS NOT NULL),
       |s3 AS (
       |  SELECT * FROM (
       |    SELECT event_type, d, y, brown, ${stage("dev", 2, 7)} AS sea
       |    FROM s2
       |    WINDOW w AS (PARTITION BY event_type ORDER BY d))
       |  WHERE sea IS NOT NULL),
       |scored AS (
       |  SELECT event_type, y*225 - pf AS err,
       |    abs(y - py7) AS snaive_err
       |  FROM (
       |    SELECT event_type, y,
       |      lag(brown, 1) OVER w + 5*lag(sea, 7) OVER w AS pf,
       |      lag(y, 7) OVER w AS py7
       |    FROM s3
       |    WINDOW w AS (PARTITION BY event_type ORDER BY d))
       |  WHERE pf IS NOT NULL AND py7 IS NOT NULL),
       |g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(abs(err)) AS BIGINT) AS sa,
       |    CAST(sum(err) AS BIGINT) AS se,
       |    CAST(sum(snaive_err) AS BIGINT) AS sn
       |  FROM scored GROUP BY 1)
       |SELECT event_type, n AS n_forecasts,
       |  floor((CAST(sa AS DOUBLE) / 225 / n)*1e6 + 0.5)/1e6 AS hw_mae,
       |  floor((CAST(se AS DOUBLE) / 225 / n)*1e6 + 0.5)/1e6 AS hw_bias,
       |  floor((CAST(sn AS DOUBLE) / n)*1e6 + 0.5)/1e6 AS snaive_mae
       |FROM g ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_chow_test" -> (chowTest _),
    "evt_holt_winters" -> (holtWinters _)
  )

  val oracle: Map[String, String] = Map(
    "evt_chow_test" -> chowOracle,
    "evt_holt_winters" -> holtWintersOracle
  )
}
