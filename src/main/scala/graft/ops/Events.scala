package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.9 — event-time operators, batch forms.
  *
  * Each operator is a batch event-time query over the `events` stream
  * surrogate (oracle-checkable); the identical DataFrame algebra runs
  * under Structured Streaming via the builders in
  * [[graft.streaming.Streams]], unit-tested with MemoryStream replay
  * (same semantics by construction — Spark plans both from one
  * logical algebra).
  *
  * Scale notes: event-time windows group by (window, key) — the
  * shuffle key includes the window bucket, so state is bounded per
  * bucket and the plan parallelizes over time × key. Session windows
  * shuffle by user then sort per user — bounded by per-user event
  * counts. Aggregating `value` (a full-precision double) is
  * order-dependent, so oracle-checked aggregates use count + exact
  * integer sums of floor(value) (SURVEY §1.5 r2).
  */
object Events {

  /** CDC latest-row-wins compaction: one surviving row per key, the
    * one greatest under `orderCols` (make the last order column a
    * unique id for a deterministic pick). A single `max_by` hash
    * aggregate — ONE shuffle on the key, no window sort, no
    * self-join; the streaming twin is dropDuplicates-keep-latest. */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(orderCols.map(col): _*)).as("_last"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** Threshold-crossing alerts, exact-cents batch form (the
    * evt_threshold_alerts_verified body, factored so planted-case
    * ScalaTests drive the production path): one alert per step
    * multiple (step = 100000 cents) a user's running total crosses,
    * with the crossing event and the exact total at the crossing.
    * Input needs (user_id, ts, event_id, value); (ts, event_id) must
    * be unique per user so the running order is total. */
  private[graft] def thresholdAlertsVerified(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("running", sum("cents").over(w))
      .withColumn("k_from", expr("(running - cents) div 100000") + 1)
      .withColumn("k_to", expr("running div 100000"))
      // Spark's sequence(a, b) DESCENDS when a > b — filter first
      .filter(col("k_to") >= col("k_from"))
      .select(col("user_id"),
        explode(sequence(col("k_from"), col("k_to")))
          .as("threshold_multiple"),
        col("event_id").as("cross_event_id"),
        col("running").as("total_cents_at_cross"))
      .orderBy("user_id", "threshold_multiple")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_tumbling_window" -> ((s, dir) =>
      loadEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value")).cast("long")).as("sum_floor_value"))
        .select(col("window.start").as("wstart"), col("window.end").as("wend"),
          col("event_type"), col("cnt"), col("sum_floor_value"))
        .orderBy("wstart", "event_type")),

    // 1-hour windows sliding every 15 min: each event lands in 4
    // windows; the oracle reconstructs the same assignment with four
    // shifted time_buckets UNION ALL'd.
    "evt_sliding_window" -> ((s, dir) =>
      loadEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value")).cast("long")).as("sum_floor_value"))
        .select(col("window.start").as("wstart"), col("window.end").as("wend"),
          col("cnt"), col("sum_floor_value"))
        .orderBy("wstart")),

    // Sessions close after 30 min of inactivity; Spark merges windows
    // that overlap, i.e. a new session starts when the gap is >= the
    // timeout — mirrored exactly by the lag-gap cumulative-sum oracle.
    "evt_session_window" -> ((s, dir) =>
      loadEvents(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("session_window.start").as("sstart"),
          col("session_window.end").as("send"), col("cnt"))
        .orderBy("user_id", "sstart")),

    // Watermark semantics are streaming-only (no DuckDB analogue): the
    // batch form plans the same windowed count (EventTimeWatermark is
    // eliminated in batch); the MemoryStream ScalaTest injects late
    // rows and asserts they are dropped.
    "evt_watermark_late" -> ((s, dir) =>
      loadEvents(s, dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("wstart"), col("cnt"))
        .orderBy("wstart")),

    // Batch twin of dropDuplicatesWithinWatermark: survivors projected
    // to the dedup key only, so the arbitrary-survivor choice cannot
    // leak into the compare.
    "evt_stateful_dedup" -> ((s, dir) =>
      loadEvents(s, dir)
        .dropDuplicates("user_id", "event_type")
        .select("user_id", "event_type")
        .orderBy("user_id", "event_type")),

    // Stream-static enrichment join: the static dim is broadcast so a
    // 100 TB event stream never shuffles for the join.
    "evt_stream_join" -> ((s, dir) => {
      val e = loadEvents(s, dir)
      val c = load(s, dir, "customer")
      e.join(broadcast(c), e("user_id") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("c_mktsegment", "event_type")
    }),

    // Batch twin of the watermarked stream-stream interval join: every
    // click joined to the same user's purchases within the following
    // hour. Both sides shuffle ONCE on user_id; the time bound is the
    // residual predicate — exactly the state-bounding condition the
    // streaming form needs (watermark + interval ⇒ both sides' state
    // evictable). Streaming twin with two MemoryStreams + watermarks
    // is asserted in StreamingSpec.
    // ONE definition of the join algebra: the batch query calls the
    // same Streams.clickPurchaseJoin the streaming twin runs
    // (withWatermark is a no-op on batch frames), so the oracle and
    // the streaming semantics cannot drift apart.
    "evt_stream_stream_join" -> ((s, dir) => {
      val e = loadEvents(s, dir)
      graft.streaming.Streams.clickPurchaseJoin(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"))
        .orderBy("click_id", "purchase_id")
    }),

    // LEFT OUTER stream-stream join, batch twin: clicks with no
    // purchase in the following hour surface with a null match — the
    // outer-emission semantics only the watermark makes possible in
    // streaming (see Streams.clickPurchaseLeftOuter, exercised
    // multi-batch in StreamingSpec). Same single user_id shuffle as
    // the inner form; null purchase_id rows order NULLS FIRST to pin
    // the compare.
    "evt_stream_outer_join" -> ((s, dir) => {
      val e = loadEvents(s, dir)
      graft.streaming.Streams.clickPurchaseLeftOuter(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"))
        .orderBy(asc("click_id"), asc_nulls_first("purchase_id"))
    }),

    // flatMapGroupsWithState, batch form (one batch = one state
    // epoch): threshold-crossing alerts per user. No oracle — the
    // per-group double accumulation order is engine-specific, so the
    // driver records rows-only; the MemoryStream twin in
    // StreamingSpec asserts the multi-batch state semantics.
    "evt_threshold_alerts" -> ((s, dir) =>
      graft.streaming.Streams.thresholdAlerts(loadEvents(s, dir), step = 1000.0)
        .orderBy("user_id", "threshold_multiple")),

    // Oracle-checked batch-relational twin of evt_threshold_alerts
    // (VERDICT r9 item 4): the alert semantics — one alert per step
    // multiple a user's running total crosses — is fully relational.
    // `value` is 2-dp, so floor(v·100 + 0.5) lifts it to EXACT cents;
    // the per-user running sum (ordered by ts, event_id — unique, so
    // the order is total) and the crossed-multiple range
    // (prev div step, running div step] are pure int64 arithmetic,
    // identical in both engines; sequence()/generate_series explodes
    // the range. Scale: one user-keyed window sort, state bounded by
    // per-user history; the explode fan-out is bounded by
    // total/step. The flatMapGroupsWithState row above stays as the
    // streaming-surface demo; this row makes its semantics a hard
    // signal. Values are all positive, so per-event crossings ==
    // the batch row's 1..floor(total/step) multiples, with the
    // crossing event and exact total at crossing surfaced as well.
    // Semantics note (ADVICE r10): this twin pins the EXACT-CENTS
    // accumulation, while the streaming row accumulates IEEE doubles —
    // on a stream whose double running total lands just below a step
    // boundary that the exact-cents total crosses, the two rows emit
    // different alerts. The twin is the stricter (and reproducible)
    // semantics; the ✗ streaming row stays a surface demo of the
    // flatMapGroupsWithState machinery, not a value oracle for it.
    "evt_threshold_alerts_verified" -> ((s, dir) =>
      thresholdAlertsVerified(loadEvents(s, dir))),

    // Rolling 7-day active users (WAU per day): rolling DISTINCT
    // cannot run as a window sum, so each observed day joins the
    // distinct (user, day) pairs of its trailing week — the tiny
    // calendar side broadcasts (it is bounded by the time range, not
    // the data volume), the fact side never shuffles for the join,
    // and the count-distinct aggregate hashes on the calendar day.
    "evt_active_users_rolling" -> ((s, dir) => {
      val days = loadEvents(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val cal = days.select(col("day").as("cal_day")).distinct()
      days.join(broadcast(cal),
          col("day") >= date_sub(col("cal_day"), 6) &&
            col("day") <= col("cal_day"))
        .groupBy("cal_day")
        .agg(countDistinct("user_id").as("wau"))
        .orderBy("cal_day")
    }),

    // Cohort retention: users bucketed by first-activity week; for
    // each (cohort week, weeks-since) cell, how many of the cohort
    // were active. Distinct (user, week) pairs first (one hash agg),
    // then the cohort min and the retention join both hash on user_id
    // — co-partitioned, no broadcast of the fact side. Week math is
    // exact integer days div 7 on Monday-truncated dates (both
    // engines truncate weeks to Monday).
    "evt_retention" -> ((s, dir) => {
      val weeks = loadEvents(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val cohort = weeks.groupBy("user_id").agg(min("wk").as("cohort_week"))
      weeks.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          expr("datediff(wk, cohort_week) div 7").cast("int").as("k"))
        .groupBy("cohort_week", "k")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "k")
    }),

    // Spark 4 transformWithState (the arbitrary-state API replacing
    // flatMapGroupsWithState): per-user running totals carried in a
    // typed ValueState cell. Batch runs one state epoch — each key's
    // rows arrive in one handleInputRows call, so the batch output is
    // the per-user total and the oracle is a plain GROUP BY. The
    // multi-batch state-persistence semantics are asserted in
    // StreamingSpec with MemoryStream + RocksDB state store.
    "evt_transform_with_state" -> ((s, dir) =>
      graft.streaming.StatefulOps.runningTotals(loadEvents(s, dir))
        .toDF().orderBy("user_id")),

    // Timer variant of transformWithState: per-user inactivity
    // sessions — streaming re-arms an event-time timer per batch and
    // handleExpiredTimer closes the session when the watermark
    // passes (asserted in StreamingSpec); the batch single epoch
    // emits the interim per-user counts, which the oracle checks.
    "evt_tws_timers" -> ((s, dir) =>
      graft.streaming.StatefulOps.inactivitySessions(
          loadEvents(s, dir), java.time.Duration.ofMinutes(30))
        .toDF().orderBy("user_id")),

    // ListState variant of transformWithState: bounded most-recent-3
    // buffer per user ("user journey" feature). Batch = one epoch, so
    // the output is the per-user top-3 by (ts, event_id) — which the
    // oracle reproduces with a window; the bounded-state trimming
    // across batches is asserted in StreamingSpec.
    "evt_tws_recent" -> ((s, dir) =>
      graft.streaming.StatefulOps.recentEvents(loadEvents(s, dir), keep = 3)
        .toDF().orderBy("user_id")),

    // CDC latest-row-wins materialization (the upsert-compaction every
    // changelog-consuming 100 TB table needs): one hash aggregate on
    // the key with max_by ordered by (ts, event_id) — event_id breaks
    // ts ties deterministically. ONE shuffle on the key; no window
    // sort, no self-join. In streaming form this is the classic
    // dropDuplicates-by-key-keep-latest state machine; in batch it is
    // a single map-side-combining aggregate.
    "evt_cdc_upsert" -> ((s, dir) =>
      // Project BEFORE the aggregate: latestByKey carries every
      // non-key column through the max_by struct, so dropping props
      // here prunes it from the scan and the shuffle.
      latestByKey(
          loadEvents(s, dir)
            .select("user_id", "event_id", "event_type", "value", "ts"),
          Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_id", "event_type", "value", "ts")
        .orderBy("user_id")),

    // IQR outlier counts per event type (Tukey fences): pass 1
    // computes exact interpolated quartiles per type (sort-based — at
    // 100 TB swap for approx_percentile, same plan shape); the
    // per-type fence table is bounded by |event_type| so it
    // broadcasts, and pass 2 is a scan-side counted comparison — the
    // fact side never shuffles for the join.
    "evt_anomaly_iqr" -> ((s, dir) => {
      val e = loadEvents(s, dir).select("event_type", "value")
      val fences = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      e.join(broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("total"),
          count(when(col("value") < col("lo") || col("value") > col("hi"), 1))
            .as("n_outliers"),
          round(first(col("lo")), 6).as("lo"),
          round(first(col("hi")), 6).as("hi"))
        .orderBy("event_type")
    }),

    // SCD Type-2 dimension versioning: each user's event_type stream
    // becomes versioned attribute rows [valid_from, valid_to) with
    // consecutive repeats collapsed and the open row flagged current
    // — the slowly-changing-dimension shape every warehouse dim table
    // maintains. Two windows over ONE shuffle on user_id (lag to
    // detect change, lead to close the interval).
    "evt_scd2" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      loadEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id").as("version_id"),
          col("event_type"), col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "version_id")
    }),

    // Time-series densification (gap filling): the minute calendar is
    // generated from the observed bounds (one sequence in a 1-row
    // frame, exploded — bounded by the TIME RANGE, not data volume,
    // so it broadcasts at any scale), left-joined to per-minute
    // counts; silent minutes surface as explicit zeros — what every
    // monitoring/feature-store rollup needs before windowing.
    "evt_gap_fill" -> ((s, dir) => {
      val m = loadEvents(s, dir)
        .select(date_trunc("minute", col("ts")).as("m"))
      val cal = m.agg(min("m").as("m0"), max("m").as("m1"))
        .select(explode(sequence(col("m0"), col("m1"),
          expr("INTERVAL 1 MINUTE"))).as("m"))
      val counts = m.groupBy("m").agg(count(lit(1)).as("cnt"))
      cal.join(counts, Seq("m"), "left")
        .select(col("m"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("m")
    }),

    // Ordered conversion funnel: first view -> first click at-or-after
    // it -> first purchase at-or-after that. Three per-user min
    // aggregates chained by joins that all hash on user_id — the
    // shuffle key never changes, so at scale the chain is one
    // co-partitioned pipeline (and each stage's input only shrinks).
    "evt_funnel" -> ((s, dir) => {
      val e = loadEvents(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") >= col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") >= col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      v.agg(count(lit(1)).as("n_users"))
        .select(lit("1_view").as("stage"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy("stage")
    })
  )

  val oracle: Map[String, String] = Map(
    "evt_threshold_alerts_verified" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, cents,
        |    sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM c),
        |k AS (
        |  SELECT user_id, event_id, running,
        |    CAST((running - cents) // 100000 + 1 AS BIGINT) AS k_from,
        |    CAST(running // 100000 AS BIGINT) AS k_to
        |  FROM r)
        |SELECT user_id,
        |  CAST(unnest(generate_series(k_from, k_to)) AS BIGINT) AS threshold_multiple,
        |  event_id AS cross_event_id,
        |  CAST(running AS BIGINT) AS total_cents_at_cross
        |FROM k WHERE k_to >= k_from
        |ORDER BY user_id, threshold_multiple""".stripMargin,

    "evt_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS wstart,
        |  time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS wend,
        |  event_type, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
        |FROM events GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,

    "evt_sliding_window" ->
      """WITH buck AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS b,
        |    value FROM events),
        |w AS (
        |  SELECT b - INTERVAL 0 MINUTE AS wstart, value FROM buck
        |  UNION ALL SELECT b - INTERVAL 15 MINUTE, value FROM buck
        |  UNION ALL SELECT b - INTERVAL 30 MINUTE, value FROM buck
        |  UNION ALL SELECT b - INTERVAL 45 MINUTE, value FROM buck)
        |SELECT wstart, wstart + INTERVAL 1 HOUR AS wend, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
        |FROM w GROUP BY wstart ORDER BY wstart""".stripMargin,

    "evt_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS sstart,
        |  max(ts) + INTERVAL 30 MINUTE AS send, count(*) AS cnt
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sstart""".stripMargin,

    "evt_stateful_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "evt_stream_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS cnt,
        |  count(DISTINCT user_id) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,

    "evt_stream_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
        |  a.user_id,
        |  CAST(a.ts AS TIMESTAMP) AS click_ts,
        |  CAST(b.ts AS TIMESTAMP) AS purchase_ts
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        |  AND CAST(b.ts AS TIMESTAMP) < CAST(a.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,

    "evt_stream_outer_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
        |  a.user_id,
        |  CAST(a.ts AS TIMESTAMP) AS click_ts,
        |  CAST(b.ts AS TIMESTAMP) AS purchase_ts
        |FROM events a LEFT JOIN events b ON a.user_id = b.user_id
        |  AND b.event_type = 'purchase'
        |  AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        |  AND CAST(b.ts AS TIMESTAMP) < CAST(a.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        |WHERE a.event_type = 'click'
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,

    "evt_active_users_rolling" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT DISTINCT day AS cal_day FROM d)
        |SELECT c.cal_day, count(DISTINCT d.user_id) AS wau
        |FROM d JOIN c ON d.day BETWEEN c.cal_day - 6 AND c.cal_day
        |GROUP BY c.cal_day ORDER BY cal_day""".stripMargin,

    "evt_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id)
        |SELECT c.cohort_week,
        |  CAST(date_diff('day', c.cohort_week, w.wk) // 7 AS INT) AS k,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, k""".stripMargin,

    "evt_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "evt_tws_timers" ->
      """SELECT user_id, count(*) AS n_events, false AS closed
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "evt_tws_recent" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY ts DESC, event_id DESC)
        |    AS recent
        |FROM (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "evt_cdc_upsert" ->
      """SELECT user_id, event_id, event_type, value,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "evt_anomaly_iqr" ->
      """WITH f AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type),
        |b AS (
        |  SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
        |    q3 + (q3 - q1) * 1.5 AS hi FROM f)
        |SELECT e.event_type, count(*) AS total,
        |  count(*) FILTER (WHERE value < lo OR value > hi) AS n_outliers,
        |  round(any_value(lo), 6) AS lo, round(any_value(hi), 6) AS hi
        |FROM events e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "evt_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM e
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_id AS version_id, event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) IS NULL AS is_current
        |FROM c ORDER BY user_id, valid_from, version_id""".stripMargin,

    "evt_gap_fill" ->
      """WITH m AS (
        |  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m FROM events),
        |cal AS (
        |  SELECT unnest(generate_series(min(m), max(m),
        |    INTERVAL 1 MINUTE)) AS m FROM m),
        |c AS (SELECT m, count(*) AS cnt FROM m GROUP BY m)
        |SELECT cal.m, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM cal LEFT JOIN c ON cal.m = c.m
        |ORDER BY cal.m""".stripMargin,

    "evt_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS v_ts FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM e JOIN v
        |  ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM e JOIN c
        |  ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin
  )
}
