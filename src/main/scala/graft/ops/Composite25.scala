package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.42 — round-16 sixth batch: streaming windowed top-k
  * and Wilson score intervals.
  *
  * Scale shapes: the windowed top-k's stateful part is ONLY the
  * hourly (window, user) count — the ranking is a stateless
  * post-step both the batch form and the streaming twin share
  * (Streams.hourlyUserCounts / rankWindowedCounts), so streaming
  * state never holds rankings; Wilson CIs are two hash aggregates
  * plus a 1-row broadcast.
  *
  * Determinism: counts exact; every CI constant enters arithmetic
  * as DOUBLE on both engines (a bare 1.96*1.96 in DuckDB is EXACT
  * DECIMAL 3.8416, which differs from the IEEE square of 1.96 —
  * the power_mde literal lesson applied to products).
  */
object Composite25 {

  // ---- evt_stream_windowed_topk ------------------------------------
  // Top-3 most active users per hour window — the batch form of the
  // dashboard leaderboard a streaming pipeline keeps. The windowed
  // count is the ONLY stateful stage; the rank filter
  // (WindowGroupLimit-pushed) runs downstream. Streaming twin with a
  // MemoryStream in StreamingSpec drives the same two functions.
  private def streamWindowedTopk(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.rankWindowedCounts(
        graft.streaming.Streams.hourlyUserCounts(loadEvents(s, dir)))
      .orderBy("wstart", "rnk")

  private val streamWindowedTopkOracle =
    """WITH c AS (
      |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
      |      AS wstart,
      |    user_id, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT wstart, user_id, cnt,
      |    CAST(row_number() OVER (
      |      PARTITION BY wstart ORDER BY cnt DESC, user_id) AS INT) AS rnk
      |  FROM c)
      |SELECT wstart, rnk, user_id, cnt
      |FROM r WHERE rnk <= 3 ORDER BY wstart, rnk""".stripMargin

  // ---- agg_wilson_ci -----------------------------------------------
  // Wilson score 95% interval for each event type's user reach —
  // the binomial CI that behaves at p near 0/1 where the Wald
  // interval collapses. Exact integer (k, n); one IEEE assembly.
  private def wilsonCi(s: SparkSession, dir: String): DataFrame = {
    val e = loadEvents(s, dir)
    val total = e.agg(countDistinct(col("user_id")).as("n_users"))
    val reach = e.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("k"))
    val z = lit(1.96)
    reach.crossJoin(broadcast(total))
      .select(col("event_type"), col("k"), col("n_users"),
        (col("k").cast("double") / col("n_users").cast("double")).as("p"),
        col("n_users").cast("double").as("n"))
      .select(col("event_type"), col("k"), col("n_users"), col("p"),
        ((col("p") + z * z / (lit(2.0) * col("n"))) /
          (lit(1.0) + z * z / col("n"))).as("center"),
        ((z * sqrt(col("p") * (lit(1.0) - col("p")) / col("n") +
          z * z / (lit(4.0) * col("n") * col("n")))) /
          (lit(1.0) + z * z / col("n"))).as("half"))
      .select(col("event_type"), col("k"), col("n_users"), col("p"),
        (col("center") - col("half")).as("ci_lo"),
        (col("center") + col("half")).as("ci_hi"))
      .orderBy("event_type")
  }

  private val wilsonCiOracle =
    """WITH t AS (
      |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events),
      |r AS (
      |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS k
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT event_type, k, t.n_users,
      |    CAST(k AS DOUBLE) / CAST(t.n_users AS DOUBLE) AS p,
      |    CAST(t.n_users AS DOUBLE) AS n,
      |    CAST(1.96 AS DOUBLE) AS z
      |  FROM r CROSS JOIN t),
      |b AS (
      |  SELECT event_type, k, n_users, p,
      |    (p + z * z / (2.0 * n)) / (1.0 + z * z / n) AS center,
      |    (z * sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) /
      |      (1.0 + z * z / n) AS half
      |  FROM a)
      |SELECT event_type, k, n_users, p,
      |  center - half AS ci_lo,
      |  center + half AS ci_hi
      |FROM b ORDER BY event_type""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_stream_windowed_topk" -> (streamWindowedTopk _),
    "agg_wilson_ci" -> (wilsonCi _)
  )

  val oracle: Map[String, String] = Map(
    "evt_stream_windowed_topk" -> streamWindowedTopkOracle,
    "agg_wilson_ci" -> wilsonCiOracle
  )
}
