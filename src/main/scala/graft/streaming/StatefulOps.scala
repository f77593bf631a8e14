package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Emitted by [[RunningTotalProcessor]]: the per-user totals as of the
  * latest processed batch. */
case class UserRunningTotal(user_id: Long, n_events: Long,
    sum_floor_value: Long)

/** Spark 4 `transformWithState` processor: per-user running event
  * count + exact integer sum of floor(value), carried across batches
  * in a single ValueState cell.
  *
  * This is the arbitrary-state API that replaces
  * flatMapGroupsWithState (compare [[Streams.thresholdAlerts]]): state
  * is declared as typed cells on the handle (value/list/map), TTL is
  * first-class, and timers are explicit. State lives in the RocksDB
  * state store, partitioned by the grouping key — the 100 TB shape is
  * state sharded across executors with changelog checkpointing, never
  * a driver-side map.
  */
class RunningTotalProcessor
    extends StatefulProcessor[Long, (Long, Double), UserRunningTotal] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[UserRunningTotal] = {
    var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { case (_, v) => n += 1; s += math.floor(v).toLong }
    totals.update((n, s))
    Iterator.single(UserRunningTotal(key, n, s))
  }
}

/** Emitted by [[RecentEventsProcessor]]: the newest `keep` event
  * types for the user, newest first, comma-joined. */
case class UserRecent(user_id: Long, recent: String)

/** ListState variant of the arbitrary-state API: a bounded
  * most-recent-events buffer per user (the "user journey" feature a
  * ranking pipeline reads). State holds at most `keep` (ts, event_id,
  * event_type) triples — appended, re-sorted, trimmed each batch, so
  * state size is O(keep) per key regardless of stream length.
  * (ts, event_id) ordering makes the survivor set deterministic:
  * event_id breaks timestamp ties.
  */
class RecentEventsProcessor(keep: Int)
    extends StatefulProcessor[Long, (Long, Long, Long, String), UserRecent] {

  @transient private var buf: ListState[(Long, Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[(Long, Long, String)]("recent",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING),
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[UserRecent] = {
    val merged = (buf.get().toSeq ++
        rows.map { case (_, ts, id, tpe) => (ts, id, tpe) })
      .sortBy { case (ts, id, _) => (-ts, -id) }
      .take(keep)
    buf.put(merged.toArray) // atomic replace of the bounded buffer
    Iterator.single(UserRecent(key, merged.map(_._3).mkString(",")))
  }
}

/** Emitted by [[InactivitySessionProcessor]]: a user's event count so
  * far (`closed = false`, Update-mode interim row) or the final count
  * when the inactivity timer fired (`closed = true`). */
case class UserSession(user_id: Long, n_events: Long, closed: Boolean)

/** Event-time TIMER variant of the arbitrary-state API: per-user
  * inactivity sessions. Each batch re-arms a timer at
  * last-event-time + gap; when the watermark passes it,
  * handleExpiredTimer emits the closed session and clears state —
  * the timeout path mapGroupsWithState spelled as GroupStateTimeout,
  * now explicit. Interim counts emit per batch (Update mode), so the
  * batch (single-epoch) form is the plain per-user count with
  * closed = false, which the oracle checks.
  */
class InactivitySessionProcessor(gapMs: Long, useTimers: Boolean)
    extends StatefulProcessor[Long, (Long, Long), UserSession] {

  @transient private var state: ValueState[(Long, Long)] = _ // (n, lastMs)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)]("sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[UserSession] = {
    var (n, lastMs) = if (state.exists()) state.get() else (0L, Long.MinValue)
    rows.foreach { case (_, tsMs) => n += 1; lastMs = math.max(lastMs, tsMs) }
    state.update((n, lastMs))
    if (useTimers) {
      // re-arm: drop the previous deadline, set last-seen + gap.
      // Batch runs TimeMode.NoTime (EventTime needs the watermark
      // machinery), where timer registration is unsupported — the
      // single epoch just emits the interim counts.
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(lastMs + gapMs)
    }
    Iterator.single(UserSession(key, n, closed = false))
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
    val (n, _) = state.get()
    state.clear()
    Iterator.single(UserSession(key, n, closed = true))
  }
}

object StatefulOps {

  /** Per-user running totals over a (streaming or batch) events frame
    * with `user_id`/`value` columns, via `transformWithState`. In
    * streaming mode each batch emits the keys it touched with their
    * cumulative totals (Update mode); state persists across batches in
    * the state store.
    */
  def runningTotals(events: DataFrame): Dataset[UserRunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming)
      // Batch runs one state epoch against a throwaway state store,
      // but still resolves the coordinator endpoint — which only
      // streaming queries create lazily. Stand it up first.
      org.apache.spark.sql.graftshim.Shim.ensureStateStoreCoordinator(spark)
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user inactivity sessions via event-time timers: interim
    * counts each batch, a closed session row when the watermark
    * passes last-seen + `gap`. The input needs `user_id`/`ts` and —
    * in streaming mode — a watermark on `ts` (timers fire off the
    * watermark). */
  def inactivitySessions(events: DataFrame,
      gap: java.time.Duration): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    if (!streaming)
      org.apache.spark.sql.graftshim.Shim.ensureStateStoreCoordinator(spark)
    events.select(col("user_id"),
        (unix_micros(col("ts")) / 1000L).cast("long").as("ts_ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new InactivitySessionProcessor(gap.toMillis, useTimers = streaming),
        if (streaming) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Update())
  }

  /** Most-recent `keep` event types per user (newest first) via a
    * ListState buffer. Needs `user_id`/`ts`/`event_id`/`event_type`
    * columns; ties on ts break by event_id. */
  def recentEvents(events: DataFrame, keep: Int): Dataset[UserRecent] = {
    require(keep > 0, s"recentEvents: keep ($keep) must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming)
      org.apache.spark.sql.graftshim.Shim.ensureStateStoreCoordinator(spark)
    events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new RecentEventsProcessor(keep),
        TimeMode.None(), OutputMode.Update())
  }
}
