package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ArrayMaxLE
import graft.util.Tables._

/** SURVEY.md §2.2 (filter/project), §2.3 (joins), §2.6 (sort/limit),
  * §2.7 (set ops).
  *
  * Scale notes per operator group:
  *  - Filters/projections compile to pushed parquet predicates +
  *    whole-stage codegen — embarrassingly parallel at any scale.
  *  - Large-large equi joins shuffle both sides on the key (sort-merge
  *    or shuffled-hash, AQE picks); dim-table joins use an explicit
  *    broadcast() hint so the 100 TB fact side never shuffles.
  *  - The as-of join avoids the quadratic range-join blowup by
  *    broadcasting the (small-cardinality) sorted key set and doing an
  *    O(log n) binary-search probe per fact row (ArrayMaxLE, a custom
  *    codegen Expression) — zero shuffle and zero allocation on the
  *    fact side; high-cardinality as-of would use a range-partitioned
  *    merge instead.
  *  - The interval join is an equi join on user_id with a range
  *    residual — never a broadcast-nested-loop over the cross product.
  */
object Relational {

  private def revenue(df: DataFrame): Column =
    asD(sum(money(col("l_extendedprice")) *
      (lit(1) - money(col("l_discount"))).cast("decimal(8,4)")))

  /** Shared backward as-of merge (events ← latest order date at or
    * before each event, per user): union both sides, ONE shuffle on
    * user_id, per-user (t, is_evt) sort, running last(ignoreNulls).
    * Orders sort before events at equal times, giving inclusive (>=)
    * as-of semantics. Returns every event row with its match in `m`
    * (null when none) — `join_asof_partitioned` filters the nulls,
    * `join_asof_tolerance` bounds the gap. */
  private[graft] def asofBackwardMerged(s: SparkSession, dir: String): DataFrame = {
    val e = loadEvents(s, dir).select(col("user_id"),
      col("ts").cast("timestamp_ntz").as("t"),
      col("event_id"), lit(1).as("is_evt"),
      lit(null).cast("timestamp_ntz").as("odate"))
    val o = load(s, dir, "orders").select(col("o_custkey").as("user_id"),
      col("o_orderdate").as("t"),
      lit(null).cast("long").as("event_id"), lit(0).as("is_evt"),
      col("o_orderdate").as("odate")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(asc("t"), asc("is_evt"))
      .rowsBetween(Long.MinValue, 0)
    e.unionByName(o)
      .withColumn("m", last(col("odate"), ignoreNulls = true).over(w))
      .filter(col("is_evt") === 1)
  }

  // ---------------------------------------------------------------- §2.2

  private val filterQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "proj_arith" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      l.select(
        col("l_orderkey"), col("l_linenumber"),
        asD(money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount"))).cast("decimal(8,4)")).as("disc_price"),
        asD(money(col("l_extendedprice")) *
          ((lit(1) - money(col("l_discount"))) * (lit(1) + money(col("l_tax"))))
            .cast("decimal(8,4)")).as("charge"),
        (col("l_quantity") * 2 + col("l_linenumber")).as("qty2"))
        // full output tuple: (l_orderkey, l_linenumber) alone is not
        // unique in this corpus (see Tables.lineitemCols note)
        .orderBy("l_orderkey", "l_linenumber", "disc_price", "charge", "qty2")
    }),

    "filter_compare" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05 &&
          col("l_extendedprice") >= 1000 && col("l_linenumber") =!= 1 &&
          col("l_tax") < 0.08)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    "filter_in_between_like" -> ((s, dir) =>
      load(s, dir, "part")
        .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#33") &&
          col("p_size").between(5, 35) &&
          (col("p_type").like("S%") || col("p_name").like("%bolt%")))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")),

    // No nulls exist on disk; derive nullable cols with nullif, then
    // exercise IS NULL / IS NOT NULL / null-safe equality (<=>).
    "filter_null_safe" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
        .withColumn("rf", expr("nullif(l_returnflag, 'N')"))
        .withColumn("ls", expr("nullif(l_linestatus, 'F')"))
      l.filter(col("rf").isNull && col("ls").isNotNull || col("rf") <=> col("ls"))
        .select("l_orderkey", "l_linenumber", "rf", "ls")
        .orderBy(asc("l_orderkey"), asc("l_linenumber"),
          asc_nulls_first("rf"), asc_nulls_first("ls"))
    }),

    // Wide-to-long UNPIVOT (melt) — the Spark 3.4+ Dataset.unpivot
    // operator; each input row fans out to one row per value column.
    "proj_unpivot" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")),

    "filter_conditional" -> ((s, dir) =>
      load(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("band"),
        coalesce(expr("nullif(o_orderstatus, 'O')"), lit("open")).as("status2"))
        .orderBy("o_orderkey"))
  )

  private val filterOracle: Map[String, String] = Map(
    "proj_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4)) AS DOUBLE) AS disc_price,
        |  CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST((1 - CAST(l_discount AS DECIMAL(15,2))) * (1 + CAST(l_tax AS DECIMAL(15,2))) AS DECIMAL(8,4)) AS DOUBLE) AS charge,
        |  l_quantity * 2 + l_linenumber AS qty2
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, disc_price, charge, qty2""".stripMargin,
    "filter_compare" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity > 30 AND l_discount <= 0.05 AND l_extendedprice >= 1000
        |  AND l_linenumber <> 1 AND l_tax < 0.08
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,
    "filter_in_between_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE p_brand IN ('Brand#11','Brand#22','Brand#33')
        |  AND p_size BETWEEN 5 AND 35
        |  AND (p_type LIKE 'S%' OR p_name LIKE '%bolt%')
        |ORDER BY p_partkey""".stripMargin,
    "filter_null_safe" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_returnflag,'N') AS rf, nullif(l_linestatus,'F') AS ls
        |FROM lineitem
        |WHERE (nullif(l_returnflag,'N') IS NULL AND nullif(l_linestatus,'F') IS NOT NULL)
        |   OR nullif(l_returnflag,'N') IS NOT DISTINCT FROM nullif(l_linestatus,'F')
        |ORDER BY l_orderkey, l_linenumber, rf NULLS FIRST, ls NULLS FIRST""".stripMargin,
    "proj_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS value
        |FROM lineitem WHERE l_orderkey < 1000
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,

    "filter_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS band,
        |  coalesce(nullif(o_orderstatus,'O'), 'open') AS status2
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )

  // ---------------------------------------------------------------- §2.3

  /** Generic bucketized band join: all (left, right) pairs sharing a
    * key with |leftTime - rightTime| <= width. A plain theta join is
    * O(n·m) per key; bucketing the integer time into width-wide cells
    * and exploding ONE side to its 3 adjacent cells turns it into an
    * EQUI-join on (key, cell) — candidates are only the 3-cell
    * neighbourhood, the band bound is a residual filter, and each
    * qualifying pair is produced exactly once (the probe side has one
    * cell; the 3 exploded cells are distinct). Column names of the two
    * frames must be disjoint; key/time arguments are column names of
    * their respective frames; times must be integral (same unit as
    * `width`). */
  private[graft] def bandJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String,
      rightTime: String, width: Long): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"bandJoin: overlapping column names $overlap")
    // width = 0 would surface as an ANSI divide-by-zero from deep in
    // the plan; width < 0 would silently return an empty join.
    require(width > 0, s"bandJoin: width $width must be positive")
    // div, not `/`: Column `/` is double division
    val cell = s"__graft_cell"
    val l = left.withColumn(cell, explode(array(
      expr(s"$leftTime div $width") - 1,
      expr(s"$leftTime div $width"),
      expr(s"$leftTime div $width") + 1)))
    val r = right.withColumn(cell, expr(s"$rightTime div $width"))
    l.join(r, col(leftKey) === col(rightKey) &&
        l(cell) === r(cell) &&
        abs(col(leftTime) - col(rightTime)) <= width)
      .select((left.columns ++ right.columns).map(col).toSeq: _*)
  }

  private val joinQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // large-large: both sides shuffle on the key (SMJ / shuffled-hash
    // via AQE) — the shape that scales to 100 TB fact-fact joins.
    "join_inner_equi" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val o = load(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice")
    }),

    // fact x dim: pin broadcast so the fact side never shuffles.
    "join_broadcast" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val p = load(s, dir, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_brand")
        .orderBy("l_orderkey", "l_linenumber", "p_partkey", "p_brand")
    }),

    "join_left_outer" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val l = load(s, dir, "lineitem").filter(col("l_quantity") > 47)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .select(col("o_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(asc_nulls_first("o_orderkey"), asc_nulls_first("l_linenumber"),
          asc_nulls_first("l_quantity"))
    }),

    "join_right_outer" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val l = load(s, dir, "lineitem").filter(col("l_quantity") > 47)
      l.join(o, o("o_orderkey") === l("l_orderkey"), "right")
        .select(col("o_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(asc_nulls_first("o_orderkey"), asc_nulls_first("l_linenumber"),
          asc_nulls_first("l_quantity"))
    }),

    "join_full_outer" -> ((s, dir) => {
      val c = load(s, dir, "customer").filter(col("c_acctbal") > 0)
      val o = load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
    }),

    "join_left_semi" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "join_left_anti" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "join_cross" -> ((s, dir) =>
      load(s, dir, "region").crossJoin(load(s, dir, "nation"))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")),

    // equi key + inequality residual: planned as a hash/merge join with
    // a post-join filter, NOT a nested loop.
    "join_theta_range" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val p = load(s, dir, "part")
      l.join(broadcast(p),
        l("l_partkey") === p("p_partkey") && l("l_extendedprice") > p("p_retailprice"))
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_retailprice")
        .orderBy("l_orderkey", "l_linenumber", "p_partkey", "p_retailprice")
    }),

    // As-of: each order matched to the greatest distinct l_shipdate <=
    // o_orderdate. Distinct ship dates are low-cardinality (~2.5k for
    // any SF), so broadcast them as ONE sorted array and binary-search
    // per fact row with the custom codegen ArrayMaxLE expression —
    // O(log n) per row, zero allocation, zero shuffle on the fact side
    // (round 1's array_max(filter(...)) allocated per row: 20 s).
    "join_asof" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val dates = load(s, dir, "lineitem")
        .agg(sort_array(collect_set(col("l_shipdate"))).as("ds"))
      o.crossJoin(broadcast(dates))
        .select(col("o_orderkey"), col("o_orderdate"),
          ArrayMaxLE(col("ds"), col("o_orderdate")).as("asof_shipdate"))
        .filter(col("asof_shipdate").isNotNull)
        .orderBy("o_orderkey")
    }),

    // High-cardinality as-of: latest order date <= event time PER
    // USER. The broadcast-array probe above needs a small global key
    // set; here the key set is (user x order-date) — too big to
    // broadcast at scale — so this is the partitioned merge-as-of:
    // union both sides, shuffle once on user_id, one per-user sort,
    // and a running last(ignoreNulls) picks the latest order at or
    // before each event. Orders sort before events at equal times so
    // the >= (inclusive) as-of semantics match DuckDB's ASOF JOIN.
    "join_asof_partitioned" -> ((s, dir) =>
      asofBackwardMerged(s, dir)
        .filter(col("m").isNotNull)
        .select(col("event_id"), col("user_id"), col("t").as("ts"),
          col("m").as("asof_orderdate"))
        .orderBy("event_id")),

    // FORWARD as-of: the EARLIEST order date at-or-after each event —
    // the mirror of join_asof_partitioned (same union + one-shuffle
    // window merge, time order reversed). At equal times orders still
    // sort before events inside the reversed frame, so the <=
    // (inclusive) semantics match DuckDB's forward ASOF JOIN.
    "join_asof_forward" -> ((s, dir) => {
      val e = loadEvents(s, dir).select(col("user_id"),
        col("ts").cast("timestamp_ntz").as("t"),
        col("event_id"), lit(1).as("is_evt"),
        lit(null).cast("timestamp_ntz").as("odate"))
      val o = load(s, dir, "orders").select(col("o_custkey").as("user_id"),
        col("o_orderdate").as("t"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_evt"),
        col("o_orderdate").as("odate")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(desc("t"), asc("is_evt"))
        .rowsBetween(Long.MinValue, 0)
      e.unionByName(o)
        .withColumn("next_orderdate", last(col("odate"), ignoreNulls = true).over(w))
        .filter(col("is_evt") === 1 && col("next_orderdate").isNotNull)
        .select(col("event_id"), col("user_id"), col("t").as("ts"),
          col("next_orderdate"))
        .orderBy("event_id")
    }),

    // NEAREST as-of: the order date closest to each event in EITHER
    // direction (ties -> the earlier/backward date). One union, one
    // shuffle on user_id, two per-partition sorted windows (backward
    // asc, forward desc); the nearest pick compares the two candidate
    // INTERVALS — identical interval semantics in DuckDB's CASE.
    "join_asof_nearest" -> ((s, dir) => {
      val e = loadEvents(s, dir).select(col("user_id"),
        col("ts").cast("timestamp_ntz").as("t"),
        col("event_id"), lit(1).as("is_evt"),
        lit(null).cast("timestamp_ntz").as("odate"))
      val o = load(s, dir, "orders").select(col("o_custkey").as("user_id"),
        col("o_orderdate").as("t"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_evt"),
        col("o_orderdate").as("odate")).distinct()
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(asc("t"), asc("is_evt"))
        .rowsBetween(Long.MinValue, 0)
      val wF = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(desc("t"), asc("is_evt"))
        .rowsBetween(Long.MinValue, 0)
      e.unionByName(o)
        .withColumn("back", last(col("odate"), ignoreNulls = true).over(wB))
        .withColumn("fwd", last(col("odate"), ignoreNulls = true).over(wF))
        .filter(col("is_evt") === 1)
        .withColumn("nearest_orderdate",
          when(col("back").isNull, col("fwd"))
            .when(col("fwd").isNull, col("back"))
            .when(col("t") - col("back") <= col("fwd") - col("t"),
              col("back"))
            .otherwise(col("fwd")))
        .filter(col("nearest_orderdate").isNotNull)
        .select(col("event_id"), col("user_id"), col("t").as("ts"),
          col("nearest_orderdate"))
        .orderBy("event_id")
    }),

    // The same as-of semantics through the bespoke physical operator
    // (graft.plans.AsOfJoinExec): both sides co-partition on the key
    // and merge in one sorted pass — no union materialization, no
    // window buffers. Same oracle as join_asof_partitioned; the
    // result equality between the two formulations is also asserted
    // in AsOfJoinSpec.
    "join_asof_merge" -> ((s, dir) => {
      val e = loadEvents(s, dir).select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("t"))
      val o = load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate")).distinct()
      graft.plans.AsOfJoin(e, o,
          e("user_id"), o("o_custkey"), e("t"), o("o_orderdate"))
        .select(col("event_id"), col("user_id"), col("t").as("ts"),
          col("o_orderdate").as("asof_orderdate"))
        .orderBy("event_id")
    }),

    // Interval join: clicks within +/-1 hour of each purchase by the
    // same user — equi join on user_id, range residual on ts. Events
    // must come through loadEvents (nanos parquet); ts is µs-resolution
    // in this corpus so the ns->µs read is lossless and the BETWEEN
    // bounds agree exactly with DuckDB's ns evaluation.
    "join_interval" -> ((s, dir) => {
      val e = loadEvents(s, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      p.join(c, "user_id")
        .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
        .select("p_id", "c_id").orderBy("p_id", "c_id")
    }),

    // Interval-interval OVERLAP join (the general form beside
    // `join_interval`'s point-in-band): purchase intervals
    // [ts, ts + floor(value) minutes] of VARIABLE length, overlapping
    // pairs per user. Scale rewrite: each interval explodes to the
    // 100-min grid cells it spans (replication = ceil(len/W)+1, never
    // n²), the join is EQUI on (user, cell) with the exact overlap
    // predicate residual, and the "overlap-start cell" condition
    // (cell == greatest(s_a, s_b) div W) emits each qualifying pair
    // EXACTLY once — no DISTINCT pass over the pair set.
    "join_interval_overlap" -> ((s, dir) => {
      val W = 100L * 60L * 1000000L // 100-minute cells, µs
      val i = loadEvents(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) +
            floor(col("value")).cast("long") * 60L * 1000000L).as("en"))
      val a = i.select(col("user_id").as("u_a"), col("event_id").as("id_a"),
          col("st").as("s_a"), col("en").as("e_a"))
        .withColumn("cell_a", explode(expr(s"sequence(s_a div $W, e_a div $W)")))
      val b = i.select(col("user_id").as("u_b"), col("event_id").as("id_b"),
          col("st").as("s_b"), col("en").as("e_b"))
        .withColumn("cell_b", explode(expr(s"sequence(s_b div $W, e_b div $W)")))
      a.join(b,
          col("u_a") === col("u_b") && col("cell_a") === col("cell_b") &&
            col("id_a") < col("id_b") &&
            col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
            col("cell_a") === expr(s"greatest(s_a, s_b) div $W"))
        .select(col("u_a").as("user_id"), col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // Skew-safe salted join: event_type has only 5 values, so a plain
    // shuffle join lands 1/5 of a 100 TB fact table on single reducer
    // keys. Salt deterministically (pmod of the row key, never rand())
    // on the fact side and replicate the dim side across all salts —
    // the shuffle key becomes (event_type, salt), fanning each hot key
    // over 16 reducers. AQE skew-split handles moderate skew
    // automatically; explicit salting is the guaranteed form.
    "join_skew_salted" -> ((s, dir) => {
      val salts = 16
      val fact = loadEvents(s, dir)
        .select(col("event_id"), col("event_type"),
          pmod(col("event_id"), lit(salts)).as("salt"))
      val dim = loadEvents(s, dir)
        .select(col("event_type")).distinct()
        .withColumn("weight", length(col("event_type")))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      fact.join(dim, Seq("event_type", "salt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("weight")).as("total_weight"))
        .orderBy("event_type")
    }),

    // Bucketized band join — the scale form of a |t_a - t_b| <= W
    // self-join, via the generic [[bandJoin]]. All time math in exact
    // integer microseconds.
    "join_range_bucketed" -> ((s, dir) => {
      val winUs = 3600L * 1000000L // 1 hour in µs
      val e = loadEvents(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val a = e.select(col("event_id").as("a_id"),
        col("user_id").as("a_user"), col("us").as("a_us"))
      val b = e.select(col("event_id").as("b_id"),
        col("user_id").as("b_user"), col("us").as("b_us"))
      bandJoin(a, b, "a_user", "b_user", "a_us", "b_us", winUs)
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // Null-safe equality JOIN (<=> as the join key): null keys MATCH
    // each other — a standard equi-join drops them silently. Spark
    // still plans this as a hash join (EqualNullSafe keys hash via a
    // null-aware coalesce), so the null bucket co-locates like any
    // other key; the tiny distinct-key dim broadcasts.
    "join_null_safe" -> ((s, dir) => {
      val l2 = load(s, dir, "lineitem")
        .select(expr("nullif(l_returnflag, 'N')").as("rf"))
      val dim = l2.distinct()
        .select(col("rf").as("flag"),
          concat(lit("grp_"), coalesce(col("rf"), lit("null"))).as("label"))
      l2.join(broadcast(dim), col("rf") <=> col("flag"))
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("label")
    }),

    // Pure-inequality join — NO equi key at all, so the only correct
    // physical strategy is BroadcastNestedLoopJoin: every fact row
    // probes every band (the bands deliberately OVERLAP, so a row can
    // match twice — semantics a CASE rewrite could not express). BNLJ
    // is O(|fact| × |build|): correct at 100 TB ONLY because the band
    // table is a constant handful of rows on the broadcast side; when
    // both sides grow, the bucketized rewrite (join_range_bucketed)
    // is the scale path.
    "join_inequality_bnl" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        (1, 0.0, 200000.0), (2, 100000.0, 300000.0),
        (3, 200000.0, 400000.0), (4, 300000.0, 600000.0))
        .toDF("band_id", "lo", "hi")
      load(s, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("cnt"),
          asD(sum(money(col("o_totalprice")))).as("total"))
        .orderBy("band_id")
    }),

    // 4-table chain; nation is a broadcast dim, the fact joins shuffle.
    "join_multiway" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val o = load(s, dir, "orders")
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(revenue(l).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    })
  )

  private val joinOracle: Map[String, String] = Map(
    // The oracle is the UNOPTIMIZED theta join — same pairs, proving
    // the bucketed equi-join rewrite loses nothing.
    "join_range_bucketed" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(CAST(a.ts AS TIMESTAMP)) -
        |          epoch_us(CAST(b.ts AS TIMESTAMP))) <= 3600000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "join_inner_equi" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, o_custkey, o_totalprice""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_partkey, p_brand""".stripMargin,
    "join_left_outer" ->
      """SELECT o_orderkey, l_linenumber, l_quantity
        |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 47) l
        |  ON o_orderkey = l.l_orderkey
        |ORDER BY o_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |  l_quantity NULLS FIRST""".stripMargin,
    "join_right_outer" ->
      """SELECT o_orderkey, l_linenumber, l_quantity
        |FROM (SELECT * FROM lineitem WHERE l_quantity > 47) l RIGHT JOIN orders
        |  ON o_orderkey = l.l_orderkey
        |ORDER BY o_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |  l_quantity NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT c_custkey, o_orderkey
        |FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
        |FULL JOIN orders ON c.c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "join_theta_range" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_retailprice
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND l_extendedprice > p_retailprice
        |ORDER BY l_orderkey, l_linenumber, p_partkey, p_retailprice""".stripMargin,
    "join_asof" ->
      """SELECT o.o_orderkey, o.o_orderdate, s.l_shipdate AS asof_shipdate
        |FROM orders o ASOF JOIN (SELECT DISTINCT l_shipdate FROM lineitem) s
        |  ON o.o_orderdate >= s.l_shipdate
        |ORDER BY o_orderkey""".stripMargin,
    "join_asof_partitioned" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  o.o_orderdate AS asof_orderdate
        |FROM events e ASOF JOIN
        |  (SELECT DISTINCT o_custkey, o_orderdate FROM orders) o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "join_asof_merge" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  o.o_orderdate AS asof_orderdate
        |FROM events e ASOF JOIN
        |  (SELECT DISTINCT o_custkey, o_orderdate FROM orders) o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "join_asof_forward" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  o.o_orderdate AS next_orderdate
        |FROM events e ASOF JOIN
        |  (SELECT DISTINCT o_custkey, o_orderdate FROM orders) o
        |  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "join_asof_nearest" ->
      """WITH o AS (SELECT DISTINCT o_custkey, o_orderdate FROM orders),
        |ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |b AS (SELECT e.event_id, o.o_orderdate AS back FROM ev e
        |  ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
        |f AS (SELECT e.event_id, o.o_orderdate AS fwd FROM ev e
        |  ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
        |SELECT ev.event_id, ev.user_id, ev.ts,
        |  CASE WHEN b.back IS NULL THEN f.fwd
        |       WHEN f.fwd IS NULL THEN b.back
        |       WHEN ev.ts - b.back <= f.fwd - ev.ts THEN b.back
        |       ELSE f.fwd END AS nearest_orderdate
        |FROM ev
        |LEFT JOIN b ON ev.event_id = b.event_id
        |LEFT JOIN f ON ev.event_id = f.event_id
        |WHERE b.back IS NOT NULL OR f.fwd IS NOT NULL
        |ORDER BY ev.event_id""".stripMargin,

    "join_interval" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR
        |ORDER BY p_id, c_id""".stripMargin,
    "join_interval_overlap" ->
      """WITH i AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) +
        |      CAST(floor(value) AS BIGINT) * 60 * 1000000 AS e
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
        |FROM i a JOIN i b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND a.s <= b.e AND b.s <= a.e
        |ORDER BY id_a, id_b""".stripMargin,

    "join_skew_salted" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(length(event_type)) AS BIGINT) AS total_weight
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "join_null_safe" ->
      """WITH l2 AS (SELECT nullif(l_returnflag, 'N') AS rf FROM lineitem),
        |dim AS (SELECT DISTINCT rf AS flag,
        |  'grp_' || coalesce(rf, 'null') AS label FROM l2)
        |SELECT label, count(*) AS cnt
        |FROM l2 JOIN dim ON rf IS NOT DISTINCT FROM flag
        |GROUP BY label ORDER BY label""".stripMargin,

    "join_inequality_bnl" ->
      """SELECT band_id, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES (1, 0.0, 200000.0), (2, 100000.0, 300000.0),
        |             (3, 200000.0, 400000.0), (4, 300000.0, 600000.0))
        |  AS bands(band_id, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "join_multiway" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )

  // ---------------------------------------------------------------- §2.6

  private val sortQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multikey" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(asc("l_returnflag"), desc_nulls_last("l_extendedprice"),
          asc("l_orderkey"), asc("l_linenumber"))),

    "limit_k" -> ((s, dir) =>
      load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)),

    // LIMIT + OFFSET pagination over a total order (Spark >= 3.4 has
    // native OFFSET; planned as a global limit of offset+k rows with
    // the first `offset` dropped at the merge — the per-partition
    // collection stays bounded by offset+k, never the full sort).
    // Deep pagination at 100 TB is an anti-pattern (offset+k rows
    // funnel through the merge); keyset pagination (filter on the
    // last-seen sort key) is the scale path — this row pins the
    // OFFSET semantics for the shallow case.
    "limit_offset" -> ((s, dir) =>
      load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .offset(50)
        .limit(25)),

    // Global top-k: planned as TakeOrderedAndProject — per-partition
    // heaps + single merge, never a full sort of 100 TB.
    "topk_global" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          asD(money(col("l_extendedprice")) *
            (lit(1) - money(col("l_discount"))).cast("decimal(8,4)")).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(10)),

    // Seeded Bernoulli sample: RNG differs across engines, so no oracle
    // (rows-only driver check + unit-test tolerance assertion).
    "sample_deterministic" -> ((s, dir) =>
      load(s, dir, "lineitem").sample(withReplacement = false, 0.01, 42)
        .agg(count(lit(1)).as("n")))
  )

  private val sortOracle: Map[String, String] = Map(
    "sort_multikey" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC NULLS LAST,
        |  l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "limit_k" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 25 OFFSET 50""".stripMargin,
    "topk_global" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""".stripMargin
  )

  // ---------------------------------------------------------------- §2.7

  private val setQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_all" -> ((s, dir) =>
      load(s, dir, "orders").select(col("o_custkey").as("custkey"))
        .union(load(s, dir, "customer").select(col("c_custkey").as("custkey")))
        .orderBy("custkey")),

    "set_union_distinct" -> ((s, dir) =>
      load(s, dir, "orders").select(col("o_custkey").as("custkey"))
        .union(load(s, dir, "customer").select(col("c_custkey").as("custkey")))
        .distinct()
        .orderBy("custkey")),

    "set_intersect" -> ((s, dir) =>
      load(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .intersect(load(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    "set_except" -> ((s, dir) =>
      load(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(load(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Schema-aligning union: the two branches project DIFFERENT column
    // sets; unionByName(allowMissingColumns) aligns by NAME and fills
    // the absent column with typed nulls — the evolution-tolerant
    // union positional UNION ALL cannot express. Pure map-side concat,
    // no shuffle beyond the output sort.
    "set_union_by_name" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val a = l.filter(col("l_linenumber") % 2 === 0)
        .select("l_orderkey", "l_quantity", "l_returnflag")
      val b = l.filter(col("l_linenumber") % 2 === 1)
        .select("l_orderkey", "l_extendedprice", "l_returnflag")
      a.unionByName(b, allowMissingColumns = true)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy(asc("l_orderkey"), asc_nulls_first("l_quantity"),
          asc_nulls_first("l_extendedprice"), asc("l_returnflag"))
    }),

    // Bag (ALL) semantics: multiplicity min(even-count, odd-count)
    // per orderkey — INTERSECT ALL is NOT the distinct intersect when
    // both sides repeat keys. Plans as a count-aggregated join, one
    // shuffle per side on the key.
    "set_intersect_all" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      l.filter(col("l_linenumber") % 2 === 0).select(col("l_orderkey"))
        .intersectAll(
          l.filter(col("l_linenumber") % 2 === 1).select(col("l_orderkey")))
        .orderBy("l_orderkey")
    }),

    // Bag EXCEPT: max(0, even-count − odd-count) copies survive.
    "set_except_all" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      l.filter(col("l_linenumber") % 2 === 0).select(col("l_orderkey"))
        .exceptAll(
          l.filter(col("l_linenumber") % 2 === 1).select(col("l_orderkey")))
        .orderBy("l_orderkey")
    }),

    // Symmetric difference as composed except/union — each leg
    // dedups+anti-joins on the same hashed key, so the three shuffles
    // share one partitioning.
    "set_symmetric_diff" -> ((s, dir) => {
      val c = load(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val o = load(s, dir, "orders").select(col("o_custkey").as("custkey"))
      c.except(o).union(o.except(c)).orderBy("custkey")
    })
  )

  private val setOracle: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT o_custkey AS custkey FROM orders
        |UNION ALL SELECT c_custkey FROM customer ORDER BY custkey""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders
        |UNION SELECT c_custkey FROM customer ORDER BY custkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY custkey""".stripMargin,
    "set_union_by_name" ->
      """SELECT l_orderkey, l_quantity, NULL AS l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_linenumber % 2 = 0
        |UNION ALL
        |SELECT l_orderkey, NULL, l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_linenumber % 2 = 1
        |ORDER BY l_orderkey, l_quantity NULLS FIRST,
        |  l_extendedprice NULLS FIRST, l_returnflag""".stripMargin,

    "set_intersect_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_linenumber % 2 = 0
        |INTERSECT ALL
        |SELECT l_orderkey FROM lineitem WHERE l_linenumber % 2 = 1
        |ORDER BY l_orderkey""".stripMargin,

    "set_except_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_linenumber % 2 = 0
        |EXCEPT ALL
        |SELECT l_orderkey FROM lineitem WHERE l_linenumber % 2 = 1
        |ORDER BY l_orderkey""".stripMargin,

    "set_symmetric_diff" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT SELECT c_custkey FROM customer)
        |ORDER BY custkey""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    filterQueries ++ joinQueries ++ sortQueries ++ setQueries
  val oracle: Map[String, String] =
    filterOracle ++ joinOracle ++ sortOracle ++ setOracle
}
