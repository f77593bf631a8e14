package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.87 (round-16 batch 2) — sequential drift detection
  * and regression diagnostics:
  *
  *  - [[pageHinkley]]: Page-Hinkley statistics per event type over
  *    daily counts — the SEQUENTIAL drift detector that completes
  *    the monitoring family (`evt_shewhart_individuals` flags single
  *    days, `evt_ewma_chart` recent-weighted shifts,
  *    `win_cusum_drift` accumulates against a reference; PH is the
  *    classic change-detection form streaming ML libraries ship:
  *    the cumulative deviation from the series mean minus its
  *    running minimum). Batch form, no reset-after-alarm —
  *    surfaced as the max statistic plus alarm-day counts in BOTH
  *    directions (increase: M_t − min_{s≤t} M_s; decrease:
  *    max_{s≤t} M_s − M_t, extrema including the empty prefix 0).
  *    M_t is kept EXACT by scaling through the mean's denominator:
  *    M_t = nd·cum_t − t·sy (BIGINT end to end); the alarm bar is
  *    the SPC family's 3σ̂ ≈ 2.66·MR̄ (Shewhart's decimal-literal
  *    constant, same σ̂ estimate).
  *
  *  - [[durbinWatson]]: Durbin-Watson residual-autocorrelation test
  *    of the per-type daily-count linear trend — the regression
  *    diagnostic beside the distributional ones (`evt_ljung_box`
  *    tests raw-series whiteness; DW tests the RESIDUALS of the
  *    fit `agg_regression`-style rows hand out, the "is OLS even
  *    valid here" gate). DW = Σ(e_t−e_{t−1})²/Σe_t² ∈ [0,4],
  *    flagged positive-autocorrelation at the conventional 1.5 cut.
  *    Residuals are kept EXACT: ẽ_t = n·den·y_t − (den·Sy −
  *    denB·St) − n·denB·t with denB = n·Sty − St·Sy and
  *    den = n·Stt − St² (all BIGINT; the common n·den scale cancels
  *    in the ratio). ẽ magnitudes stay ≤ ~1e14 at sf0.1 (< 2^53),
  *    so the doubles that enter the two square sums are EXACT per
  *    term; only the final Σ carries the usual ~1e-15 relative
  *    sum-order drift — inside the floor-6 presentation.
  *
  * Scale shape (both): one (type, day) COUNT aggregate
  * (localCheckpoint'd — stats + the windowed pass read it), one lag/
  * cum window stack sharing a single (type, d) sort, one hash
  * aggregate per type, 5-row stats broadcast back. Two passes over
  * |types|·|days|, zero raw-event passes beyond the COUNT.
  */
object Composite71 {

  // ---- evt_page_hinkley ----------------------------------------------------

  private val PhBar = "(2.66*(CAST(smr AS DOUBLE)/(nd - 1)))"

  private[graft] def pageHinkleyOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint()
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = daily
      .select(col("event_type"), col("y"),
        abs(col("y") - lag(col("y"), 1).over(w)).as("mr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("y")).as("sy"),
        sum(col("mr")).as("smr"))
      .filter(col("nd") > 1)
    // M_t = nd·cum_t − t·sy — the mean-centered cumulative sum scaled
    // by nd so it stays an exact BIGINT; running extrema INCLUDE the
    // empty prefix (M_0 = 0), hence the least/greatest against 0.
    val m = daily
      .join(broadcast(stats), "event_type")
      .select(col("event_type"), col("d"), col("nd"), col("smr"),
        (col("nd") * sum(col("y")).over(wCum)
          - row_number().over(w) * col("sy")).as("mt"))
      .select(col("event_type"), col("nd"), col("smr"),
        (col("mt") - least(lit(0L), min(col("mt")).over(wCum))).as("ph_inc"),
        (greatest(lit(0L), max(col("mt")).over(wCum)) - col("mt")).as("ph_dec"))
    m.groupBy(col("event_type"))
      .agg(max(col("nd")).as("nd"), max(col("smr")).as("smr"),
        max(col("ph_inc")).as("phi"), max(col("ph_dec")).as("phd"),
        sum(expr(s"CASE WHEN CAST(ph_inc AS DOUBLE)/nd > $PhBar THEN 1 ELSE 0 END"))
          .cast("long").as("n_alarm_inc"),
        sum(expr(s"CASE WHEN CAST(ph_dec AS DOUBLE)/nd > $PhBar THEN 1 ELSE 0 END"))
          .cast("long").as("n_alarm_dec"))
      .selectExpr("event_type", "nd AS n_days",
        "floor((CAST(phi AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS ph_inc_max",
        "floor((CAST(phd AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS ph_dec_max",
        s"floor(($PhBar)*1e6 + 0.5)/1e6 AS alarm_bar",
        "n_alarm_inc", "n_alarm_dec")
      .orderBy("event_type")
  }

  private def pageHinkley(s: SparkSession, dir: String): DataFrame =
    pageHinkleyOn(loadEvents(s, dir))

  private val pageHinkleyOracle =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |stats AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(abs(y - ly)) AS BIGINT) AS smr
       |  FROM (SELECT event_type, y,
       |    lag(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS ly
       |    FROM daily)
       |  GROUP BY 1 HAVING count(*) > 1),
       |m AS (
       |  SELECT daily.event_type, d, nd, smr,
       |    nd*(CAST(sum(y) OVER w AS BIGINT))
       |      - (CAST(row_number() OVER w AS BIGINT))*sy AS mt
       |  FROM daily JOIN stats ON daily.event_type = stats.event_type
       |  WINDOW w AS (PARTITION BY daily.event_type ORDER BY d
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ph AS (
       |  SELECT event_type, nd, smr,
       |    mt - least(CAST(0 AS BIGINT), min(mt) OVER w) AS ph_inc,
       |    greatest(CAST(0 AS BIGINT), max(mt) OVER w) - mt AS ph_dec
       |  FROM m
       |  WINDOW w AS (PARTITION BY event_type ORDER BY d
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |g AS (
       |  SELECT event_type, max(nd) AS nd, max(smr) AS smr,
       |    max(ph_inc) AS phi, max(ph_dec) AS phd,
       |    CAST(sum(CASE WHEN CAST(ph_inc AS DOUBLE)/nd > $PhBar
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_inc,
       |    CAST(sum(CASE WHEN CAST(ph_dec AS DOUBLE)/nd > $PhBar
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_dec
       |  FROM ph GROUP BY 1)
       |SELECT event_type, nd AS n_days,
       |  floor((CAST(phi AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS ph_inc_max,
       |  floor((CAST(phd AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS ph_dec_max,
       |  floor(($PhBar)*1e6 + 0.5)/1e6 AS alarm_bar,
       |  n_alarm_inc, n_alarm_dec
       |FROM g ORDER BY event_type""".stripMargin

  // ---- evt_durbin_watson ---------------------------------------------------

  private[graft] def durbinWatsonOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint()
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val indexed = daily
      .select(col("event_type"), col("y"),
        row_number().over(w).cast("long").as("t"))
      .localCheckpoint() // stats + residual pass share one sort
    val stats = indexed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("y")).as("sy"), sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("y")).as("sty"))
      .filter(col("n") > 2)
      .selectExpr("event_type", "n", "st", "sy",
        "n*sty - st*sy AS denb", "n*stt - st*st AS den")
    // ẽ_t = n·den·y − (den·Sy − denB·St) − n·denB·t: the residual
    // scaled by n·den, exact BIGINT (≲1e14 at sf0.1 — exact in the
    // double it becomes); the scale cancels in the DW ratio.
    val wT = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val resid = indexed
      .join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n"), col("denb"), col("den"), col("t"),
        (col("n") * col("den") * col("y")
          - (col("den") * col("sy") - col("denb") * col("st"))
          - col("n") * col("denb") * col("t")).cast("double").as("e"))
      .select(col("event_type"), col("n"), col("denb"), col("den"),
        col("e"), lag(col("e"), 1).over(wT).as("ep"))
    resid.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("denb")).as("denb"),
        max(col("den")).as("den"),
        sum(col("e") * col("e")).as("see"),
        sum(expr("CASE WHEN ep IS NULL THEN 0.0 ELSE (e - ep)*(e - ep) END"))
          .as("sdd"))
      .selectExpr("event_type", "n AS n_days",
        "floor((CAST(denb AS DOUBLE)/den)*1e6 + 0.5)/1e6 AS slope",
        "floor((sdd/nullif(see, 0))*1e6 + 0.5)/1e6 AS dw",
        "(sdd/nullif(see, 0) < 1.5) AS positive_autocorr_dw15")
      .orderBy("event_type")
  }

  private def durbinWatson(s: SparkSession, dir: String): DataFrame =
    durbinWatsonOn(loadEvents(s, dir))

  private val durbinWatsonOracle =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, y,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
      |      AS BIGINT) AS t
      |  FROM daily),
      |stats AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(t*t) AS BIGINT) AS stt, CAST(sum(t*y) AS BIGINT) AS sty
      |  FROM idx GROUP BY 1 HAVING count(*) > 2),
      |coef AS (
      |  SELECT event_type, n, st, sy,
      |    n*sty - st*sy AS denb, n*stt - st*st AS den
      |  FROM stats),
      |resid AS (
      |  SELECT idx.event_type, n, denb, den,
      |    CAST(n*den*y - (den*sy - denb*st) - n*denb*t AS DOUBLE) AS e,
      |    lag(CAST(n*den*y - (den*sy - denb*st) - n*denb*t AS DOUBLE), 1)
      |      OVER (PARTITION BY idx.event_type ORDER BY t) AS ep
      |  FROM idx JOIN coef ON idx.event_type = coef.event_type),
      |g AS (
      |  SELECT event_type, max(n) AS n, max(denb) AS denb,
      |    max(den) AS den,
      |    sum(e*e) AS see,
      |    sum(CASE WHEN ep IS NULL THEN 0.0 ELSE (e - ep)*(e - ep) END)
      |      AS sdd
      |  FROM resid GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  floor((CAST(denb AS DOUBLE)/den)*1e6 + 0.5)/1e6 AS slope,
      |  floor((sdd/nullif(see, 0))*1e6 + 0.5)/1e6 AS dw,
      |  (sdd/nullif(see, 0) < 1.5) AS positive_autocorr_dw15
      |FROM g ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_page_hinkley" -> (pageHinkley _),
    "evt_durbin_watson" -> (durbinWatson _)
  )

  val oracle: Map[String, String] = Map(
    "evt_page_hinkley" -> pageHinkleyOracle,
    "evt_durbin_watson" -> durbinWatsonOracle
  )
}
