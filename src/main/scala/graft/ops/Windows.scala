package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.5 — window functions.
  *
  * Scale notes: every window here is PARTITIONED (by customer, by
  * priority, by user) — the shuffle hashes on the partition key and
  * each partition sorts independently, the shape that scales to any
  * data size. No window uses a global ORDER BY without partitioning
  * except via the final presentation sort, which the hash contract
  * demands anyway. Determinism: every window ORDER BY includes a
  * unique tiebreaker key; ranking functions over non-unique orderings
  * are only used where ties produce identical outputs (rank/dense_rank
  * peers), and running frames always order on a unique key.
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-3 orders per customer: rank-then-filter. The window shuffle
    // partitions by o_custkey; per-partition sort only.
    "win_row_number_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // rank/dense_rank/percent_rank over price alone (ties share ranks,
    // so output is deterministic); ntile needs a total order, so its
    // window adds the unique key tiebreak.
    "win_ranks" -> ((s, dir) => {
      val byPrice = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("o_totalprice"))
      val total = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          rank().over(byPrice).as("rnk"),
          dense_rank().over(byPrice).as("drnk"),
          percent_rank().over(byPrice).as("prnk"),
          ntile(4).over(total).as("quartile"))
        .orderBy(asc("o_orderpriority"), desc("o_totalprice"), asc("o_orderkey"))
    }),

    // Previous/next value per user ordered by event time (unique
    // tiebreak event_id both in the frame order and the final sort).
    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      loadEvents(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    }),

    // Running 3-row sum over a unique order key; decimal accumulation
    // keeps the 3-term sum exact on both engines.
    "win_running_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(asc("o_orderkey")).rowsBetween(-2, 0)
      load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          asD(sum(money(col("o_totalprice"))).over(w)).as("run3"),
          count(lit(1)).over(w).as("run3_n"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Value-range frame: peers share frames, so ties are harmless by
    // construction. RANGE boundaries need the SQL form for a double
    // ordering column.
    "win_range_frame" -> ((s, dir) =>
      load(s, dir, "orders")
        .selectExpr("o_orderpriority", "o_orderkey", "o_totalprice",
          """CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
            |  PARTITION BY o_orderpriority ORDER BY o_totalprice
            |  RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS DOUBLE)
            |  AS near_sum""".stripMargin,
          """count(*) OVER (
            |  PARTITION BY o_orderpriority ORDER BY o_totalprice
            |  RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS near_n""".stripMargin)
        .orderBy("o_orderpriority", "o_orderkey")),

    // IGNORE NULLS navigation: the previous and the latest purchase
    // value carried across a user's NON-purchase events — lag/last
    // with respectNulls would return the interleaved nulls instead of
    // skipping them. One user_id window shuffle; raw doubles compare
    // exactly (no accumulation).
    "win_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val pv = when(col("event_type") === "purchase", col("value"))
      loadEvents(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          lag(pv, 1, null, ignoreNulls = true).over(w).as("prev_purchase"),
          last(pv, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("latest_purchase"))
        .orderBy("user_id", "event_id")
    }),

    // Windowed COUNT(DISTINCT) — unsupported directly in both engines
    // — via the standard dense_rank trick: the max dense_rank over the
    // partition IS the distinct count. Two windows over ONE o_custkey
    // shuffle (same partitioning, different orderings).
    "win_distinct_count" -> ((s, dir) => {
      val wo = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
      val wp = Window.partitionBy("o_custkey")
      load(s, dir, "orders")
        .withColumn("dr", dense_rank().over(wo))
        .select(col("o_custkey"), col("o_orderkey"),
          max(col("dr")).over(wp).cast("long").as("n_distinct_prio"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Time-interval RANGE frame: each order's trailing-7-day revenue
    // for its customer — the event-time sibling of the numeric RANGE
    // frame above. The frame bound is an INTERVAL against the ORDER
    // BY timestamp; same-date peers share a frame, so the windowed
    // values are tie-insensitive and the decimal accumulation keeps
    // them exact. One window shuffle on o_custkey.
    "win_time_range_frame" -> ((s, dir) =>
      load(s, dir, "orders")
        .selectExpr("o_custkey", "o_orderkey", "o_orderdate",
          """CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
            |  PARTITION BY o_custkey ORDER BY o_orderdate
            |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
            |  AS DOUBLE) AS wk_rev""".stripMargin,
          """count(*) OVER (
            |  PARTITION BY o_custkey ORDER BY o_orderdate
            |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
            |  AS wk_n""".stripMargin)
        .orderBy("o_custkey", "o_orderkey")),

    "win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          first(col("o_totalprice")).over(w).as("first_price"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // cume_dist is tie-stable (peers share count(<=)/n), so the
    // value-only window order is deterministic.
    "win_cume_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(asc("o_totalprice"))
      load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    }),

    "win_nth_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
          nth_value(col("o_totalprice"), 10).over(w).as("tenth_price"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Per-customer price z-score outliers. mean/stddev come from
    // EXACT decimal window sums (sum, sum of squares) cast to double
    // at the end, so the value is independent of partial-aggregation
    // order in BOTH engines — stddev_samp's double accumulation would
    // not be. One shuffle on o_custkey; |z| > 2 filters after.
    "win_zscore" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
      val p = money(col("o_totalprice"))
      load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n"),
          asD(sum(p).over(w)).as("sx"),
          asD(sum(p * p).over(w)).as("sxx"))
        .filter(col("n") >= 2)
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("variance",
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
        .filter(col("variance") > 0)
        .withColumn("z", round(
          (col("o_totalprice") - col("mean")) / sqrt(col("variance")), 6))
        .filter(abs(col("z")) > 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("z"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Gaps-and-islands: per-user runs of CONSECUTIVE active days. The
    // island key is day minus the per-user day rank — constant within
    // a run, strictly dropping across a gap. One window shuffle on
    // user_id (distinct days first, so the window input is tiny),
    // then a hash agg per island.
    "win_gap_islands" -> ((s, dir) => {
      val days = loadEvents(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("grp", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(min("day").as("streak_start"), max("day").as("streak_end"),
          count(lit(1)).as("len"))
        .select("user_id", "streak_start", "streak_end", "len")
        .orderBy("user_id", "streak_start")
    })
  )

  val oracle: Map[String, String] = Map(
    "win_row_number_topk" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_ranks" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rank() OVER wp AS INT) AS rnk,
        |  CAST(dense_rank() OVER wp AS INT) AS drnk,
        |  percent_rank() OVER wp AS prnk,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quartile
        |FROM orders
        |WINDOW wp AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "win_running_frame" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE) AS run3,
        |  count(*) OVER w AS run3_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "win_range_frame" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE) AS near_sum,
        |  count(*) OVER w AS near_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |  RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "win_ignore_nulls" ->
      """SELECT user_id, event_id, event_type,
        |  lag(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER w AS prev_purchase,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS latest_purchase
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "win_distinct_count" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(max(dr) OVER (PARTITION BY o_custkey) AS BIGINT)
        |    AS n_distinct_prio
        |FROM (SELECT *, dense_rank() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderpriority) AS dr FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_time_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE) AS wk_rev,
        |  count(*) OVER w AS wk_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_orderpriority, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  first_value(o_totalprice) OVER w AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "win_cume_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  cume_dist() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice) AS cd
        |FROM orders
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,

    "win_nth_value" ->
      """SELECT o_orderpriority, o_orderkey,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  nth_value(o_totalprice, 10) OVER w AS tenth_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "win_zscore" ->
      """WITH s AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    count(*) OVER w AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE) AS sx,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(15,2)) *
        |      CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE) AS sxx
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey)),
        |z AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    round((o_totalprice - sx / n) /
        |      sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS z
        |  FROM s WHERE n >= 2 AND (sxx - sx * sx / n) / (n - 1) > 0)
        |SELECT o_custkey, o_orderkey, o_totalprice, z
        |FROM z WHERE abs(z) > 2
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_gap_islands" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY day) AS INT) AS grp
        |  FROM d)
        |SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
        |  count(*) AS len
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, streak_start""".stripMargin
  )
}
