package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.66 (round-24 batch 8) — control-chart monitoring:
  *
  *  - [[shewhart]]: Shewhart individuals (I-MR) chart per event
  *    type over daily counts — center line, moving-range estimate
  *    of short-term sigma (MR̄/d₂ via the standard 2.66·MR̄ = 3σ̂
  *    constant), the UCL/LCL limits, and the out-of-control day
  *    counts. The SPC family triangulates: `agg_process_capability`
  *    scores Cp/Cpk against SPEC limits, `win_cusum_drift`
  *    accumulates small persistent shifts; the individuals chart is
  *    the day-level 3σ alarm every ops dashboard draws first.
  *
  * Scale shape: one lag window over the (type, day) COUNT aggregate
  * (weighted-median rule) → one hash aggregate per type → 5-row
  * limits broadcast back into the same daily aggregate for the
  * violation counts. Two passes over |types|·|days|, zero passes
  * over raw events beyond the first COUNT.
  *
  * Determinism: Σy and Σ|Δy| are exact BIGINTs; the limits assemble
  * once from identical formula text (2.66·MR̄ is a decimal-literal
  * PRODUCT onto a double — §1.5 rule 8 safe; no decimal division);
  * violations compare integer days against the identically-assembled
  * unrounded limit on both engines; surfaced stats floor-6-dp.
  */
object Composite50 {

  private def dailyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))

  private val ShUcl = "(CAST(sy AS DOUBLE)/nd + 2.66*(CAST(smr AS DOUBLE)/(nd - 1)))"
  private val ShLcl = "(CAST(sy AS DOUBLE)/nd - 2.66*(CAST(smr AS DOUBLE)/(nd - 1)))"

  private[graft] def shewhartOn(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events).localCheckpoint()
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val stats = daily
      .select(col("event_type"), col("y"),
        abs(col("y") - lag(col("y"), 1).over(w)).as("mr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("y")).as("sy"),
        sum(col("mr")).as("smr"))
      .filter(col("nd") > 1)
    daily.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("nd")).as("nd"), max(col("sy")).as("sy"),
        max(col("smr")).as("smr"),
        sum(expr(s"CASE WHEN CAST(y AS DOUBLE) > $ShUcl THEN 1 ELSE 0 END"))
          .cast("long").as("n_above_ucl"),
        sum(expr(s"CASE WHEN CAST(y AS DOUBLE) < $ShLcl THEN 1 ELSE 0 END"))
          .cast("long").as("n_below_lcl"))
      .selectExpr("event_type", "nd AS n_days",
        "floor((CAST(sy AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS center",
        "floor((CAST(smr AS DOUBLE)/(nd - 1))*1e6 + 0.5)/1e6 AS mr_bar",
        s"floor(($ShUcl)*1e6 + 0.5)/1e6 AS ucl",
        s"floor(($ShLcl)*1e6 + 0.5)/1e6 AS lcl",
        "n_above_ucl", "n_below_lcl")
      .orderBy("event_type")
  }

  private def shewhart(s: SparkSession, dir: String): DataFrame =
    shewhartOn(loadEvents(s, dir))

  private val shewhartOracle =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |mrs AS (
       |  SELECT event_type, y,
       |    abs(y - lag(y, 1) OVER (PARTITION BY event_type ORDER BY d))
       |      AS mr
       |  FROM daily),
       |stats AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(mr) AS BIGINT) AS smr
       |  FROM mrs GROUP BY 1 HAVING count(*) > 1),
       |g AS (
       |  SELECT daily.event_type, max(nd) AS nd, max(sy) AS sy,
       |    max(smr) AS smr,
       |    CAST(sum(CASE WHEN CAST(y AS DOUBLE) > $ShUcl THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_above_ucl,
       |    CAST(sum(CASE WHEN CAST(y AS DOUBLE) < $ShLcl THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_below_lcl
       |  FROM daily JOIN stats ON daily.event_type = stats.event_type
       |  GROUP BY 1)
       |SELECT event_type, nd AS n_days,
       |  floor((CAST(sy AS DOUBLE)/nd)*1e6 + 0.5)/1e6 AS center,
       |  floor((CAST(smr AS DOUBLE)/(nd - 1))*1e6 + 0.5)/1e6 AS mr_bar,
       |  floor(($ShUcl)*1e6 + 0.5)/1e6 AS ucl,
       |  floor(($ShLcl)*1e6 + 0.5)/1e6 AS lcl,
       |  n_above_ucl, n_below_lcl
       |FROM g ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_shewhart_individuals" -> (shewhart _)
  )

  val oracle: Map[String, String] = Map(
    "evt_shewhart_individuals" -> shewhartOracle
  )
}
