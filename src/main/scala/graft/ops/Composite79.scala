package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.89 (round-17 batch 6) — `evt_seasonal_mann_kendall`:
  * the Hirsch–Slack seasonal Mann–Kendall trend test per event type
  * over daily counts, with WEEKDAY strata. `win_mann_kendall` pools
  * every pair, so a strong weekly cycle (weekend dips) reads as
  * noise or masks a real drift; the seasonal form compares each
  * weekday only with the same weekday (S' = Σ_g S_g over the seven
  * strata, Var' = Σ_g Var_g with per-stratum tie correction) and the
  * z applies the same ±1 continuity correction as the pooled row —
  * shared conventions, so the two rows read side by side.
  *
  * Scale shape: the pair join is per (type, weekday) — pairs are
  * bounded by (span/7)² per stratum, a TIME-HORIZON constant (the
  * win_mann_kendall justification: at 100 TB only the first groupBy
  * grows). S and the tie term are exact BIGINTs; the variance and z
  * assemble once from shared text.
  */
object Composite79 {

  private val smkVar =
    """(CAST(nn AS DOUBLE) * (nn - 1) * (2 * nn + 5)
      |  - CAST(tie_corr AS DOUBLE)) / 18.0""".stripMargin

  private[graft] def seasonalMannKendallOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("c"))
      // ISO weekday stratum (1 = Monday … 7 = Sunday on both engines)
      .withColumn("g", (weekday(col("d")) + lit(1)).cast("int"))
      .localCheckpoint() // pair join both sides + the tie aggregate
    val sStat = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.g") === col("b.g") && col("a.d") < col("b.d"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.c") - col("a.c")).cast("bigint")).as("s"))
    // Per-stratum MK variance needs n and the tie spectrum WITHIN the
    // stratum; both come from one (type, weekday, count-value) agg.
    val strata = daily.groupBy(col("event_type"), col("g"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"), col("g"))
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tc"))
      .select(col("event_type"), col("n"),
        expr("CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - CAST(tc AS DOUBLE)")
          .as("vg"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_days"),
        count(lit(1)).as("n_strata"),
        (sum(col("vg")) / 18.0).as("var_s"))
    sStat.join(strata, "event_type")
      .filter(col("n_days") >= 10)
      .selectExpr("event_type", "n_days", "n_strata", "s",
        "round(var_s, 6) AS var_s",
        """round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
          |     WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
          |     ELSE CAST(0 AS DOUBLE) END, 6) AS z""".stripMargin)
      .orderBy("event_type")
  }

  private def seasonalMannKendall(s: SparkSession, dir: String): DataFrame =
    seasonalMannKendallOn(loadEvents(s, dir))

  private val seasonalMkOracle =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(isodow(CAST(ts AS DATE)) AS INT) AS g,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT a.event_type, CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.g = b.g AND a.d < b.d
      |  GROUP BY a.event_type),
      |ties AS (
      |  SELECT event_type, g, CAST(sum(t) AS BIGINT) AS n,
      |    CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tc
      |  FROM (SELECT event_type, g, c, CAST(count(*) AS BIGINT) AS t
      |        FROM daily GROUP BY 1, 2, 3)
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_days,
      |    CAST(count(*) AS BIGINT) AS n_strata,
      |    sum(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
      |      - CAST(tc AS DOUBLE)) / 18.0 AS var_s
      |  FROM ties GROUP BY 1)
      |SELECT s.event_type AS event_type, n_days, n_strata, s,
      |  round(var_s, 6) AS var_s,
      |  round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
      |    WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
      |    ELSE CAST(0 AS DOUBLE) END, 6) AS z
      |FROM s JOIN st ON s.event_type = st.event_type
      |WHERE n_days >= 10
      |ORDER BY s.event_type""".stripMargin

  // ---- registration ---------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_seasonal_mann_kendall" -> (seasonalMannKendall _)
  )

  val oracle: Map[String, String] = Map(
    "evt_seasonal_mann_kendall" -> seasonalMkOracle
  )
}
