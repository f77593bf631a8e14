package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.88 (round-16 batch 3) — Aroon trend indicator:
  *
  *  - [[aroon]]: the 14-day Aroon oscillator per event type over
  *    daily counts — the time-since-extreme member the indicator
  *    family still lacked (`win_donchian_channel` gives the extreme
  *    LEVELS, `win_rsi`/`win_macd` momentum, `win_stochastic` the
  *    position within the range; Aroon measures RECENCY of the
  *    extremes: aroon_up = 100·(13 − days_since_14d_high)/13, down
  *    with the low, oscillator = up − down). Tie rule: the MOST
  *    RECENT extreme (the conventional reading), implemented as the
  *    first match over the lag pivot.
  *
  * Scale shape: the win_ewma_backtest lag-pivot discipline — ONE
  * (type, d)-sorted window produces all 13 lags over the
  * |types|·|days| COUNT aggregate (never raw events), and the
  * days-since-extreme is a fixed 14-branch CASE over the pivoted
  * columns: exact integers end to end, no nested windows, no
  * engine-specific argmax-over-window semantics (max_by/arg_max
  * window support and tie rules differ across engines; the CASE
  * pivot is plain SQL both sides execute identically).
  *
  * Determinism: gaps are exact integers; the two ratios are single
  * shared-text double divisions of integers, floor-6 surfaced.
  */
object Composite74 {

  private val Lags = 13 // window = current day + 13 preceding = 14

  private def sinceCase(agg: String): String =
    (0 to Lags).map(j =>
      s"WHEN ${if (j == 0) "y" else s"l$j"} = $agg THEN $j")
      .mkString("CASE ", " ", " END")

  private val gMax = (0 to Lags)
    .map(j => if (j == 0) "y" else s"l$j").mkString("greatest(", ", ", ")")
  private val gMin = (0 to Lags)
    .map(j => if (j == 0) "y" else s"l$j").mkString("least(", ", ", ")")

  private[graft] def aroonOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val lagCols = (1 to Lags).map(j => lag(col("y"), j).over(w).as(s"l$j"))
    daily
      .select(col("event_type") +: col("d") +: col("y") +: lagCols: _*)
      .filter(col(s"l$Lags").isNotNull)
      .selectExpr("event_type", "d", "y",
        s"CAST(${sinceCase(gMax)} AS BIGINT) AS days_since_high",
        s"CAST(${sinceCase(gMin)} AS BIGINT) AS days_since_low")
      .selectExpr("event_type", "d", "y", "days_since_high",
        "days_since_low",
        s"""floor((CAST(100*($Lags - days_since_high) AS DOUBLE)/$Lags)
           |*1e6 + 0.5)/1e6 AS aroon_up""".stripMargin,
        s"""floor((CAST(100*($Lags - days_since_low) AS DOUBLE)/$Lags)
           |*1e6 + 0.5)/1e6 AS aroon_down""".stripMargin,
        s"""floor((CAST(100*(days_since_low - days_since_high) AS DOUBLE)
           |/$Lags)*1e6 + 0.5)/1e6 AS aroon_osc""".stripMargin)
      .orderBy("event_type", "d")
  }

  private def aroon(s: SparkSession, dir: String): DataFrame =
    aroonOn(loadEvents(s, dir))

  private val aroonOracle = {
    val lagDefs = (1 to Lags).map(j => s"lag(y, $j) OVER w AS l$j")
      .mkString(",\n    ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, d, y,
       |    $lagDefs
       |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
       |s AS (
       |  SELECT event_type, d, y,
       |    CAST(${sinceCase(gMax)} AS BIGINT) AS days_since_high,
       |    CAST(${sinceCase(gMin)} AS BIGINT) AS days_since_low
       |  FROM lagged WHERE l$Lags IS NOT NULL)
       |SELECT event_type, d, y, days_since_high, days_since_low,
       |  floor((CAST(100*($Lags - days_since_high) AS DOUBLE)/$Lags)
       |   *1e6 + 0.5)/1e6 AS aroon_up,
       |  floor((CAST(100*($Lags - days_since_low) AS DOUBLE)/$Lags)
       |   *1e6 + 0.5)/1e6 AS aroon_down,
       |  floor((CAST(100*(days_since_low - days_since_high) AS DOUBLE)
       |   /$Lags)*1e6 + 0.5)/1e6 AS aroon_osc
       |FROM s ORDER BY event_type, d""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_aroon" -> (aroon _)
  )

  val oracle: Map[String, String] = Map(
    "win_aroon" -> aroonOracle
  )
}
