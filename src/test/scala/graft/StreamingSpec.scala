package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** MemoryStream replay tests (SURVEY §5.3): streaming twins equal
  * their batch forms, watermarks drop late rows, within-watermark
  * dedup emits exactly-once. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def runStream(name: String, events: Seq[Ev],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String): Unit = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(events)
    val q = build(ms.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
  }

  test("tumbling window: streaming result equals batch twin") {
    val events = Seq(
      Ev(1, t("10:05"), 1, "click", 1.0), Ev(2, t("10:55"), 1, "click", 2.0),
      Ev(3, t("11:05"), 2, "view", 3.0), Ev(4, t("10:15"), 2, "click", 4.0))
    import spark.implicits._
    runStream("tumb", events, Streams.tumblingCounts, "complete")
    val streamed = spark.table("tumb").orderBy("wstart", "event_type").collect()
    val batch = Streams.tumblingCounts(events.toDF())
      .orderBy("wstart", "event_type").collect()
    assert(streamed.sameElements(batch))
  }

  test("session window: streaming result equals batch twin") {
    val events = Seq(
      Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:10"), 1, "a", 0), // one session
      Ev(3, t("11:30"), 1, "a", 0),                               // new session
      Ev(4, t("10:00"), 2, "a", 0))
    import spark.implicits._
    runStream("sess", events, Streams.sessionCounts, "complete")
    val streamed = spark.table("sess").orderBy("user_id", "sstart").collect()
    val batch = Streams.sessionCounts(events.toDF())
      .orderBy("user_id", "sstart").collect()
    assert(streamed.sameElements(batch))
    assert(streamed.length == 3)
  }

  test("sliding window: streaming result equals batch twin") {
    val events = Seq(
      Ev(1, t("10:05"), 1, "a", 0), Ev(2, t("10:20"), 1, "a", 0),
      Ev(3, t("11:02"), 2, "a", 0))
    import spark.implicits._
    runStream("slide", events, Streams.slidingCounts, "complete")
    val streamed = spark.table("slide").orderBy("wstart").collect()
    val batch = Streams.slidingCounts(events.toDF()).orderBy("wstart").collect()
    assert(streamed.sameElements(batch))
    // each event belongs to exactly 4 sliding windows (1h window, 15m slide)
    assert(batch.map(_.getLong(1)).sum == events.size * 4)
  }

  test("watermark: late event beyond 30-min watermark is dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.windowedWithWatermark(ms.toDF()).writeStream
      .format("memory").queryName("late").outputMode("append").start()
    // batch 1: events at 10:05 and 12:00 -> watermark advances to 11:30
    ms.addData(Seq(Ev(1, t("10:05"), 1, "a", 0), Ev(2, t("12:00"), 1, "a", 0)))
    q.processAllAvailable()
    // batch 2: late event at 10:06 (< watermark) must be dropped;
    // 13:00 advances the watermark so the 12:00 window finalizes too.
    ms.addData(Seq(Ev(3, t("10:06"), 1, "a", 0), Ev(4, t("13:00"), 1, "a", 0)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("late").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    // the 10:00-10:10 window finalized with ONLY the on-time event
    assert(out(t("10:00")) == 1L, s"late row leaked into $out")
  }

  test("dropDuplicatesWithinWatermark: duplicate event_id emitted once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.dedupWithinWatermark(ms.toDF()).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    ms.addData(Seq(
      Ev(1, t("10:00"), 1, "a", 0), Ev(1, t("10:01"), 1, "a", 0),
      Ev(2, t("10:02"), 1, "a", 0)))
    q.processAllAvailable()
    ms.addData(Seq(Ev(1, t("10:03"), 1, "a", 0))) // still within watermark
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
    assert(ids.sorted.sameElements(Array(1L, 2L)), s"got ${ids.mkString(",")}")
  }

  test("mapGroupsWithState: per-user running count accumulates across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.runningCountPerUser(ms.toDF()).writeStream
      .format("memory").queryName("runcount").outputMode("update").start()
    ms.addData(Seq(Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:01"), 1, "a", 0),
      Ev(3, t("10:02"), 2, "a", 0)))
    q.processAllAvailable()
    ms.addData(Seq(Ev(4, t("10:03"), 1, "a", 0)))
    q.processAllAvailable(); q.stop()
    val byUser = spark.table("runcount").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    // user 1: 2 in batch one, then state carries to 3 in batch two
    assert(byUser(1L) == 3L && byUser(2L) == 1L, s"got $byUser")
  }

  test("stream-stream interval join matches batch twin and drops out-of-window pairs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Streams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    clicks.addData(Seq(
      Ev(1, t("10:00"), 1, "click", 0),
      Ev(2, t("10:30"), 2, "click", 0)))
    purchases.addData(Seq(
      Ev(10, t("10:20"), 1, "purchase", 0), // within 1h of click 1 -> joins
      Ev(11, t("12:00"), 2, "purchase", 0), // 1.5h after click 2 -> dropped
      Ev(12, t("10:40"), 3, "purchase", 0))) // no click for user 3
    q.processAllAvailable()
    // advance both watermarks so in-window results finalize (distinct
    // users so the advancing rows can't join each other)
    clicks.addData(Seq(Ev(3, t("14:00"), 8, "click", 0)))
    purchases.addData(Seq(Ev(13, t("14:00"), 9, "purchase", 0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(Array((1L, 10L))), s"got ${got.mkString(",")}")
  }

  test("file-source streaming: newly arrived files are picked up incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fsrc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.format("memory").queryName("fsrc")
      .outputMode("append").start()
    q.processAllAvailable()
    val n1 = spark.table("fsrc").count()
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val ids = spark.table("fsrc").select("id").collect().map(_.getLong(0)).sorted
    assert(n1 == 2, s"initial files not fully ingested: $n1")
    assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
  }

  test("foreachBatch: batch-id-keyed overwrite makes epoch replay idempotent") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream.foreachBatch {
      (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // one directory per epoch + OVERWRITE = the exactly-once
        // file-sink recipe: a retried epoch rewrites, never appends
        df.write.mode("overwrite").parquet(s"$out/batch=$id")
        df.write.mode("overwrite").parquet(s"$out/batch=$id") // retry
        ()
    }.start()
    ms.addData(Seq(Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:01"), 1, "a", 0)))
    q.processAllAvailable()
    ms.addData(Seq(Ev(3, t("10:02"), 2, "a", 0)))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L)),
      s"replayed epoch duplicated rows: ${got.mkString(",")}")
  }

  test("stream-stream LEFT OUTER join: null match emitted only after the watermark closes the interval") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Streams.clickPurchaseLeftOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssouter")
      .outputMode("append").start()
    clicks.addData(Seq(
      Ev(1, t("10:00"), 1, "click", 0),   // will match
      Ev(2, t("10:30"), 2, "click", 0)))  // never matches
    purchases.addData(Seq(Ev(10, t("10:20"), 1, "purchase", 0)))
    q.processAllAvailable()
    // click 2's interval is still open — no null row may exist yet
    val early = spark.table("ssouter").select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(!early.contains((2L, -1L)),
      s"null match emitted before watermark: ${early.mkString(",")}")
    // advance both watermarks past click 2's interval end (11:30)
    clicks.addData(Seq(Ev(3, t("14:00"), 8, "click", 0)))
    purchases.addData(Seq(Ev(13, t("14:00"), 9, "purchase", 0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssouter").select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted
    assert(got.sameElements(Array((1L, 10L), (2L, -1L))),
      s"got ${got.mkString(",")}")
  }

  test("flatMapGroupsWithState: one alert per threshold multiple crossed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.thresholdAlerts(ms.toDF(), step = 10.0).writeStream
      .format("memory").queryName("alerts").outputMode("append").start()
    // batch 1: user 1 reaches 25 -> alerts for multiples 1 and 2
    ms.addData(Seq(Ev(1, t("10:00"), 1, "a", 7.0), Ev(2, t("10:01"), 1, "a", 18.0)))
    q.processAllAvailable()
    // batch 2: user 1 reaches 41 -> multiples 3 and 4; user 2 stays at 5 -> none
    ms.addData(Seq(Ev(3, t("10:02"), 1, "a", 16.0), Ev(4, t("10:03"), 2, "a", 5.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("alerts")
      .select("user_id", "threshold_multiple").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(Array((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))),
      s"got ${got.mkString(",")}")
  }

  test("foreachBatch sink: every micro-batch lands exactly once in parquet") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        df.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(out)
      }
      .start()
    ms.addData(Seq(Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:01"), 1, "a", 0)))
    q.processAllAvailable()
    ms.addData(Seq(Ev(3, t("10:02"), 2, "a", 0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    assert(rows.select("batch_id").distinct().count() == 2)
  }

  test("transformWithState: per-user totals persist across micro-batches (RocksDB state)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = graft.streaming.StatefulOps.runningTotals(ms.toDF())
        .writeStream.format("memory").queryName("tws").outputMode("update").start()
      try {
        ms.addData(Seq(
          Ev(1, t("10:00"), 1, "a", 1.9), Ev(2, t("10:01"), 1, "a", 2.9),
          Ev(3, t("10:02"), 2, "a", 5.5)))
        q.processAllAvailable()
        ms.addData(Seq(
          Ev(4, t("10:03"), 1, "a", 3.1), Ev(5, t("10:04"), 3, "a", 7.0)))
        q.processAllAvailable()
      } finally q.stop() // never leak a RocksDB-backed query into later tests
      // Update mode: take each user's LAST emission = cumulative total.
      val finals = spark.table("tws").groupBy("user_id")
        .agg(max("n_events").as("n"), max("sum_floor_value").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // user 1: batches 1+2 -> 3 events, floor sums 1+2+3; state carried over.
      assert(finals === Map(1L -> (3L, 6L), 2L -> (1L, 5L), 3L -> (1L, 7L)),
        s"got $finals")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState ListState: recent-events buffer trims across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = graft.streaming.StatefulOps.recentEvents(ms.toDF(), keep = 3)
        .writeStream.format("memory").queryName("twsl").outputMode("update").start()
      try {
        ms.addData(Seq(
          Ev(1, t("10:00"), 1, "view", 0), Ev(2, t("10:01"), 1, "click", 0)))
        q.processAllAvailable()
        ms.addData(Seq(
          Ev(3, t("10:02"), 1, "cart", 0), Ev(4, t("10:03"), 1, "purchase", 0)))
        q.processAllAvailable()
      } finally q.stop()
      // last emission: newest-first top-3 ACROSS both batches (view trimmed)
      val last = spark.table("twsl").collect().map(_.getString(1)).last
      assert(last == "purchase,cart,click", s"got $last")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState timers: inactivity sessions close when the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = graft.streaming.StatefulOps.inactivitySessions(
          ms.toDF().withWatermark("ts", "0 seconds"),
          java.time.Duration.ofMinutes(30))
        .writeStream.format("memory").queryName("twst").outputMode("update").start()
      try {
        // batch 1: two users active around 10:00
        ms.addData(Seq(
          Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:05"), 1, "a", 0),
          Ev(3, t("10:00"), 2, "a", 0)))
        q.processAllAvailable()
        // batch 2: a 12:00 event advances the watermark far past both
        // users' 30-min inactivity deadlines -> their sessions close
        ms.addData(Seq(Ev(4, t("12:00"), 3, "a", 0)))
        q.processAllAvailable()
      } finally q.stop()
      val closed = spark.table("twst").filter(col("closed"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(closed === Map(1L -> 2L, 2L -> 1L), s"closed sessions: $closed")
      // user 3's session is still open (watermark has not passed 12:30)
      val openUsers = spark.table("twst").filter(!col("closed"))
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(openUsers.contains(3L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-static enrichment join equals batch join") {
    import spark.implicits._
    val customers = Seq((1L, "ALPHA"), (2L, "BETA"))
      .toDF("c_custkey", "c_mktsegment")
    val events = Seq(Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:01"), 2, "b", 0),
      Ev(3, t("10:02"), 99, "c", 0)) // 99 unmatched -> dropped
    runStream("enrich", events,
      df => Streams.enrich(df, customers).select(col("event_id"), col("c_mktsegment")),
      "append")
    val got = spark.table("enrich").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.sameElements(Array((1L, "ALPHA"), (2L, "BETA"))))
  }

  test("windowed top-k: streaming counts equal batch; shared ranking agrees") {
    // The stateful stage is ONLY hourlyUserCounts; rankWindowedCounts
    // is a stateless post-step both forms share — assert the
    // streamed counts match batch, then that ranking them gives the
    // evt_stream_windowed_topk surface.
    val events = Seq(
      Ev(1, t("10:05"), 1, "c", 0), Ev(2, t("10:10"), 1, "c", 0),
      Ev(3, t("10:15"), 2, "c", 0), Ev(4, t("10:20"), 2, "c", 0),
      Ev(5, t("10:25"), 2, "c", 0), Ev(6, t("10:30"), 3, "c", 0),
      Ev(7, t("10:35"), 4, "c", 0), Ev(8, t("11:05"), 4, "c", 0))
    import spark.implicits._
    runStream("wtopk", events, Streams.hourlyUserCounts, "complete")
    val streamed = spark.table("wtopk")
      .orderBy("wstart", "user_id").collect()
    val batch = Streams.hourlyUserCounts(events.toDF())
      .orderBy("wstart", "user_id").collect()
    assert(streamed.sameElements(batch))
    val ranked = Streams.rankWindowedCounts(spark.table("wtopk"))
      .orderBy("wstart", "rnk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // hour 10: user 2 (3 events), user 1 (2), then user 3 before 4 on
    // the id tiebreak; hour 11: only user 4
    assert(ranked.take(3).sameElements(Array((1, 2L, 3L), (2, 1L, 2L), (3, 3L, 1L))))
    assert(ranked.last == ((1, 4L, 1L)))
  }
}
