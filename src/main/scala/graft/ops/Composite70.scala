package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.86 (round-16 batch 1) — EWMA control chart:
  *
  *  - [[ewmaChart]]: per-event-type EWMA chart over daily counts —
  *    the third member of the SPC trio beside the day-level 3σ alarm
  *    (`evt_shewhart_individuals`) and the cumulative drift detector
  *    (`win_cusum_drift`): the exponentially-weighted mean reacts to
  *    SMALL PERSISTENT shifts a Shewhart chart misses while
  *    forgetting old data the way CUSUM never does, with λ the
  *    memory knob. λ = 1/2 dyadic, truncated at 16 lags (the
  *    win_ewma_backtest discipline): the statistic's numerator is
  *    the exact-integer dot product Σ_{j=0..16} y_{t−j}·2^(16−j)
  *    over 131071 (= 2^17 − 1, the normalized truncated geometric
  *    series), so the EWMA itself carries no float recursion at all.
  *    Control limits use the ASYMPTOTIC EWMA sigma
  *    μ ± 3σ̂·sqrt(λ/(2−λ)) = μ ± sqrt(3)·σ̂ (λ = 1/2 ⇒
  *    λ/(2−λ) = 1/3) with σ̂ the moving-range estimate MR̄/1.128
  *    shared with the Shewhart row; days without a full 16-lag
  *    window score nothing (the backtest rule — the steady-state
  *    limit is only honest once the weights have saturated).
  *
  * Scale shape: one lag window over the (type, day) COUNT aggregate
  * (the weighted-median window rule: partition-key windows run over
  * the aggregate, never raw events), one hash aggregate per type,
  * 5-row limits broadcast back into the same daily aggregate for the
  * violation counts — two passes over |types|·|days|, zero passes
  * over raw events beyond the first COUNT (the Shewhart shape).
  *
  * Determinism: Σy, Σ|Δy| and every EWMA numerator are exact
  * BIGINTs; limits assemble once from identical formula text
  * (sqrt(3) is correctly-rounded IEEE on both engines; /1.128 is one
  * double division); violations compare the identically-assembled
  * doubles; surfaced stats floor-6-dp.
  */
object Composite70 {

  private val EwLags = 16
  private val EwDenom = (1L << (EwLags + 1)) - 1 // 131071

  private val EwSigma = "(CAST(smr AS DOUBLE)/(nd - 1)/1.128)"
  private val EwUcl = s"(CAST(sy AS DOUBLE)/nd + sqrt(3)*$EwSigma)"
  private val EwLcl = s"(CAST(sy AS DOUBLE)/nd - sqrt(3)*$EwSigma)"
  private val EwZ = s"(CAST(znum AS DOUBLE)/$EwDenom)"

  private[graft] def ewmaChartOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint() // two consumers: MR stats + the lag window
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val stats = daily
      .select(col("event_type"), col("y"),
        abs(col("y") - lag(col("y"), 1).over(w)).as("mr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("y")).as("sy"),
        sum(col("mr")).as("smr"))
      .filter(col("nd") > 1)
    val lagCols = (1 to EwLags).map(j => lag(col("y"), j).over(w).as(s"l$j"))
    // znum = y·2^16 + Σ_{j=1..16} l_j·2^(16−j): exact-integer EWMA
    // numerator (the backtest dot product with the current day in).
    val zNum = (1 to EwLags)
      .map(j => col(s"l$j") * lit(1L << (EwLags - j)))
      .foldLeft(col("y") * lit(1L << EwLags))(_ + _)
    daily
      .select(col("event_type") +: col("y") +: lagCols: _*)
      .filter(col(s"l$EwLags").isNotNull)
      .select(col("event_type"), zNum.as("znum"))
      .join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"), max(col("nd")).as("nd"),
        max(col("sy")).as("sy"), max(col("smr")).as("smr"),
        sum(expr(s"CASE WHEN $EwZ > $EwUcl THEN 1 ELSE 0 END"))
          .cast("long").as("n_above_ucl"),
        sum(expr(s"CASE WHEN $EwZ < $EwLcl THEN 1 ELSE 0 END"))
          .cast("long").as("n_below_lcl"))
      .selectExpr("event_type", "n_scored",
        "floor((CAST(sy AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS center",
        s"floor(($EwSigma)*1e6 + 0.5)/1e6 AS sigma_hat",
        s"floor(($EwUcl)*1e6 + 0.5)/1e6 AS ucl",
        s"floor(($EwLcl)*1e6 + 0.5)/1e6 AS lcl",
        "n_above_ucl", "n_below_lcl")
      .orderBy("event_type")
  }

  private def ewmaChart(s: SparkSession, dir: String): DataFrame =
    ewmaChartOn(loadEvents(s, dir))

  private val ewmaChartOracle = {
    val lagDefs = (1 to EwLags).map(j => s"lag(y, $j) OVER w AS l$j")
      .mkString(",\n    ")
    val zNum = (s"y*${1L << EwLags}" +: (1 to EwLags)
      .map(j => s"l$j*${1L << (EwLags - j)}")).mkString(" + ")
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
       |zrows AS (
       |  SELECT event_type, CAST($zNum AS BIGINT) AS znum FROM (
       |    SELECT event_type, y,
       |      $lagDefs
       |    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
       |  WHERE l$EwLags IS NOT NULL),
       |g AS (
       |  SELECT zrows.event_type, CAST(count(*) AS BIGINT) AS n_scored,
       |    max(nd) AS nd, max(sy) AS sy, max(smr) AS smr,
       |    CAST(sum(CASE WHEN $EwZ > $EwUcl THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_above_ucl,
       |    CAST(sum(CASE WHEN $EwZ < $EwLcl THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_below_lcl
       |  FROM zrows JOIN stats ON zrows.event_type = stats.event_type
       |  GROUP BY 1)
       |SELECT event_type, n_scored,
       |  floor((CAST(sy AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS center,
       |  floor(($EwSigma)*1e6 + 0.5)/1e6 AS sigma_hat,
       |  floor(($EwUcl)*1e6 + 0.5)/1e6 AS ucl,
       |  floor(($EwLcl)*1e6 + 0.5)/1e6 AS lcl,
       |  n_above_ucl, n_below_lcl
       |FROM g ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_ewma_chart" -> (ewmaChart _)
  )

  val oracle: Map[String, String] = Map(
    "evt_ewma_chart" -> ewmaChartOracle
  )
}
