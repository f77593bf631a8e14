package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.69 (round-25 batch 2) — stationarity and
  * autocorrelation surfaces:
  *
  *  - [[adfUnitRoot]]: Dickey-Fuller unit-root test per event type
  *    over daily counts — the COMPLEMENT of `evt_kpss_level`
  *    (Composite46): KPSS's null is level-stationarity, DF's null is
  *    a unit root, and the textbook protocol reads them TOGETHER
  *    (KPSS rejects + DF rejects ⇒ conflicting, both retain ⇒
  *    underpowered, ...), so this row surfaces both verdicts
  *    side-by-side. Regression form Δy_t = α + γ·y_{t−1}, t-statistic
  *    on γ̂ against the 5% constant-only asymptotic critical value
  *    −2.86 (Fuller 1976 table; no trend term, no augmentation lags
  *    — the DF(0) member of the ADF family, documented choice
  *    mirrored in the oracle).
  *
  *  - [[acfTable]]: the lag-1..7 autocorrelation TABLE per event
  *    type. `evt_ljung_box` consumes these ρ_k internally and emits
  *    only the pooled Q — this row surfaces the individual
  *    correlogram a forecaster actually reads (which lag carries the
  *    structure), one row per (type, lag), from the SAME
  *    `Composite45.lagMoments` co-moment aggregate and ρ formula
  *    text.
  *
  * Scale shapes: both are one (type, day) COUNT aggregate feeding
  * per-type lag windows (bounded by |types|·|days|, never raw
  * events) into ONE hash aggregate; the ADF↔KPSS join is
  * |types|-row. Determinism: ADF co-moments Σx², Σx·Δy, Σ(Δy)²
  * accumulate in exact DECIMAL(38,0) (daily-count products leave
  * BIGINT range at the 100 TB target, §1.5 r9) with the oracle's
  * VARCHAR routing (§1.5 r7); Σx, ΣΔy are exact BIGINTs; γ̂/t
  * assemble once from shared formula text (every n-degree product
  * already double); ACF ρ_k reuse Ljung-Box's proven
  * cast-before-multiply discipline; verdicts and surfaced values
  * compare after the 6-dp floor.
  */
object Composite53 {

  private def dailyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))

  // ---- evt_adf_unit_root -------------------------------------------------
  // Centered second moments (m = #lag-pairs): cxx = Σx² − (Σx)²/m,
  // cxy = Σx·Δy − Σx·ΣΔy/m, cyy = Σ(Δy)² − (ΣΔy)²/m; γ̂ = cxy/cxx,
  // SSE = cyy − γ̂·cxy, t = γ̂ / sqrt(SSE/(m−2)/cxx). The variance
  // ratio is gated > 0 BEFORE the sqrt: a PERFECT fit leaves SSE a
  // few ulp either side of zero, and sqrt of the tiny-negative side
  // is NaN — which Spark surfaces as NaN while the brute/oracle
  // contract wants NULL (scalacheck-found on alternating series).
  private val adfT =
    """((cxy / nullif(cxx, 0))
      | / nullif(sqrt(CASE WHEN ((cyy - (cxy / nullif(cxx, 0))*cxy)
      |   / nullif(m - 2, 0)) / nullif(cxx, 0) > 0
      |   THEN ((cyy - (cxy / nullif(cxx, 0))*cxy)
      |   / nullif(m - 2, 0)) / nullif(cxx, 0) END), 0))""".stripMargin
  private val adfTF = s"floor(($adfT)*1e6 + 0.5)/1e6"

  private[graft] def adfOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val lagged = dailyCounts(events)
      .select(col("event_type"), col("y"),
        lag(col("y"), 1).over(w).as("x"))
      .filter(col("x").isNotNull)
      .select(col("event_type"), col("x"), (col("y") - col("x")).as("dy"))
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"),
        sum(col("dy")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .cast("double").as("sxx"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0))"))
          .cast("double").as("sxy"),
        sum(expr("CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0))"))
          .cast("double").as("syy"))
      .selectExpr("event_type", "m",
        "sxx - CAST(sx AS DOUBLE)*sx/m AS cxx",
        "sxy - CAST(sx AS DOUBLE)*sy/m AS cxy",
        "syy - CAST(sy AS DOUBLE)*sy/m AS cyy")
      .selectExpr("event_type", "m + 1 AS n_days",
        s"$adfTF AS adf_t_stat",
        s"($adfTF < -2.86) AS reject_unit_root_5pct")
  }

  private def adfUnitRoot(s: SparkSession, dir: String): DataFrame = {
    val ev = loadEvents(s, dir)
    adfOn(ev)
      .join(Composite46.kpssLevelOn(ev)
        .select(col("event_type"),
          col("reject_level_stationary_5pct")
            .as("kpss_reject_level_stationary_5pct")),
        Seq("event_type"), "left")
      .orderBy("event_type")
  }

  private val adfOracle =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, y,
       |    lag(y) OVER (PARTITION BY event_type ORDER BY d) AS x
       |  FROM daily),
       |pairs AS (
       |  SELECT event_type, x, y - x AS dy FROM lagged
       |  WHERE x IS NOT NULL),
       |g AS (
       |  SELECT event_type,
       |    CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(dy) AS BIGINT) AS sy,
       |    CAST(CAST(sum(CAST(x AS DECIMAL(19,0))
       |      * CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sxx,
       |    CAST(CAST(sum(CAST(x AS DECIMAL(19,0))
       |      * CAST(dy AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sxy,
       |    CAST(CAST(sum(CAST(dy AS DECIMAL(19,0))
       |      * CAST(dy AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS syy
       |  FROM pairs GROUP BY 1),
       |c AS (
       |  SELECT event_type, m,
       |    sxx - CAST(sx AS DOUBLE)*sx/m AS cxx,
       |    sxy - CAST(sx AS DOUBLE)*sy/m AS cxy,
       |    syy - CAST(sy AS DOUBLE)*sy/m AS cyy
       |  FROM g),
       |adf AS (
       |  SELECT event_type, m + 1 AS n_days,
       |    $adfTF AS adf_t_stat,
       |    ($adfTF < -2.86) AS reject_unit_root_5pct
       |  FROM c)
       |SELECT adf.event_type, adf.n_days, adf.adf_t_stat,
       |  adf.reject_unit_root_5pct,
       |  kp.reject_level_stationary_5pct
       |    AS kpss_reject_level_stationary_5pct
       |FROM adf LEFT JOIN (
       |${Composite46.kpssLevelOracle}
       |) kp ON adf.event_type = kp.event_type
       |ORDER BY adf.event_type""".stripMargin

  // ---- win_acf_table -----------------------------------------------------
  private val AcfLags = 7

  private[graft] def acfTableOn(events: DataFrame): DataFrame = {
    val stackArgs = (1 to AcfLags).map(k =>
      s"CAST($k AS BIGINT), floor((${Composite45.rhoF(k)})*1e6 + 0.5)/1e6")
      .mkString(", ")
    Composite45.lagMoments(events, AcfLags)
      .selectExpr("event_type", "nd AS n_days",
        s"stack($AcfLags, $stackArgs) AS (lag, acf)")
      .orderBy("event_type", "lag")
  }

  private def acfTable(s: SparkSession, dir: String): DataFrame =
    acfTableOn(loadEvents(s, dir))

  private val acfOracle = {
    val branches = (1 to AcfLags).map(k =>
      s"""SELECT event_type, nd AS n_days, CAST($k AS BIGINT) AS lag,
         |  floor((${Composite45.rhoF(k)})*1e6 + 0.5)/1e6 AS acf
         |FROM g""".stripMargin).mkString("\nUNION ALL\n")
    val moments = (1 to AcfLags).flatMap(k => Seq(
      s"CAST(count(l$k) AS BIGINT) AS n$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN y END) AS BIGINT) AS sa$k",
      s"CAST(sum(l$k) AS BIGINT) AS sb$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN y*y END) AS BIGINT) AS saa$k",
      s"CAST(sum(l$k*l$k) AS BIGINT) AS sbb$k",
      s"CAST(sum(y*l$k) AS BIGINT) AS sab$k")).mkString(",\n    ")
    val lagCols = (1 to AcfLags).map(k =>
      s"lag(y, $k) OVER (PARTITION BY event_type ORDER BY d) AS l$k")
      .mkString(",\n    ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, y,
       |    $lagCols
       |  FROM daily),
       |g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
       |    $moments
       |  FROM lagged GROUP BY 1)
       |$branches
       |ORDER BY event_type, lag""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_adf_unit_root" -> (adfUnitRoot _),
    "win_acf_table" -> (acfTable _)
  )

  val oracle: Map[String, String] = Map(
    "evt_adf_unit_root" -> adfOracle,
    "win_acf_table" -> acfOracle
  )
}
