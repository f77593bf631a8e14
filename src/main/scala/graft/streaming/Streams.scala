package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 streaming twins (§1.4: Structured Streaming, never
  * DStream). Each builder applies the SAME DataFrame algebra as its
  * batch form in [[graft.ops.Events]] — Spark plans batch and
  * streaming from one logical algebra, so semantics carry over by
  * construction; the ScalaTest MemoryStream suite replays events
  * through these and asserts equality with the batch results plus the
  * streaming-only behaviors (late-drop, within-watermark dedup).
  *
  * Scale notes: event-time state is keyed by (window, key) with
  * watermark-bounded retention — the state store never grows beyond
  * (keys x open windows), the shape that survives unbounded streams.
  */
object Streams {

  /** Twin of `evt_tumbling_window` (counts only — streaming sinks
    * aggregate incrementally; sums of doubles stay batch-only). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

  /** Twin of `evt_sliding_window`. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("cnt"))

  /** Twin of `evt_session_window`. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("sstart"),
        col("session_window.end").as("send"), col("cnt"))

  /** `evt_watermark_late`: 30-min watermark over 10-min tumbling
    * counts; in append mode a window is emitted once finalized and
    * events older than the watermark are dropped. */
  def windowedWithWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("cnt"))

  /** `evt_stateful_dedup` streaming form: exactly-once survivors per
    * event_id with watermark-bounded state. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** `evt_stream_join`: stream-static broadcast enrichment. */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers),
      events("user_id") === customers("c_custkey"))

  /** `evt_stream_stream_join` streaming form: watermarked
    * stream-stream interval join. The watermarks plus the two-sided
    * time bound are what make the join's state evictable — Spark can
    * drop click state once the purchase watermark passes click_ts +
    * 1 hour, so state is bounded by (rate × interval), not stream
    * length. Same algebra as the batch twin in Events. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** `evt_stream_outer_join` streaming form: the LEFT OUTER variant of
    * [[clickPurchaseJoin]]. Outer stream-stream joins REQUIRE the
    * watermark + time-bound pair (inner joins merely benefit): a null
    * match can only be emitted once the right-side watermark proves no
    * future purchase can land inside the click's interval, so the
    * unmatched row is held in state exactly until then — bounded
    * state, eventual emission, the semantics corner batch left joins
    * get for free. Same algebra on a batch frame (watermarks are
    * no-ops there), so the batch twin oracles it. */
  def clickPurchaseLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Arbitrary custom state via mapGroupsWithState (§1.4): a running
    * per-user event count that survives across micro-batches. State is
    * keyed by user — the KeyValueGroupedDataset shuffle partitions the
    * state store exactly like any keyed aggregation, so it scales with
    * the key space, not the stream length. */
  def runningCountPerUser(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    events.selectExpr("user_id", "event_id").as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n_events")
  }

  /** flatMapGroupsWithState (§1.4): 0..n outputs per group per batch —
    * here, one alert row each time a user's cumulative value crosses
    * another multiple of `step`. Same keyed state-store scaling as
    * [[runningCountPerUser]]; the flat form is the general shape
    * (alerts, sessionization emitting closed sessions, compaction). */
  def thresholdAlerts(events: DataFrame, step: Double = 10.0): DataFrame = {
    // step <= 0 would make floor(total/step) overflow to Long extremes
    // and the alert range emit ~2^63 rows — fail fast instead
    require(step > 0, s"step must be positive, got $step")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Long, Double)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val prev = state.getOption.getOrElse(0.0)
          val total = prev + rows.map(_._2).sum
          state.update(total)
          // one alert per step boundary crossed this batch (0..n rows)
          val from = math.floor(prev / step).toLong
          val to = math.floor(total / step).toLong
          ((from + 1) to to).iterator.map(k => (user, k, total))
      }
      .toDF("user_id", "threshold_multiple", "running_total")
  }

  /** `evt_stream_windowed_topk`'s windowed aggregate: per-hour
    * (window, user) activity counts. The streaming form runs THIS
    * aggregate (the state Spark must keep); the per-window top-3
    * ranking is a stateless post-step both forms share via
    * [[rankWindowedCounts]] — in streaming it runs downstream of the
    * windowed agg per micro-batch emission. */
  def hourlyUserCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("user_id"), col("cnt"))

  /** Stateless ranking shared by the batch query and the streaming
    * twin's test assertion: top-3 users per hour window by
    * (cnt DESC, user_id ASC). */
  def rankWindowedCounts(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("wstart"))
      .orderBy(col("cnt").desc, col("user_id").asc)
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("wstart"), col("rnk"), col("user_id"), col("cnt"))
  }
}
