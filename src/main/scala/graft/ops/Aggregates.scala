package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.4 — aggregation operators.
  *
  * Scale notes: every aggregate here is a two-phase HashAggregate
  * (map-side partial -> shuffle on group keys -> final). Group-key
  * cardinality is tiny relative to input (flags, status, keys), so the
  * shuffle moves only partial states — the pattern that survives 100 TB.
  * Money aggregates accumulate in exact DECIMAL (order-independent)
  * and surface as DOUBLE (SURVEY §1.5 rule 2).
  */
object Aggregates {

  /** TPC-H Q1 shape: the flagship end-to-end slice (SURVEY §7.2). */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = load(spark, dir, "lineitem")
    val discFactor = (lit(1) - money($"l_discount")).cast("decimal(8,4)")
    val chargeFactor =
      ((lit(1) - money($"l_discount")) * (lit(1) + money($"l_tax")))
        .cast("decimal(8,4)")
    l.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        asD(sum(money($"l_extendedprice"))).as("sum_base_price"),
        asD(sum(money($"l_extendedprice") * discFactor)).as("sum_disc_price"),
        asD(sum(money($"l_extendedprice") * chargeFactor)).as("sum_charge"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (asD(sum(money($"l_extendedprice"))) / count(lit(1))).as("avg_price"),
        (asD(sum(money($"l_discount"))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** §2.4 `agg_stats` — distribution statistics with hash-exact
    * determinism: raw double stddev/var/corr are accumulation-order
    * dependent, so accumulate exact DECIMAL power sums (order-free)
    * and evaluate ONE deterministic double formula, written
    * identically in the oracle SQL. IEEE 754 ops are deterministic, so
    * both engines produce bit-identical results with no rounding
    * fudge. Scale: the shuffle moves 6 decimal partials per group.
    */
  private def aggStats(s: SparkSession, dir: String): DataFrame = {
    val l = load(s, dir, "lineitem")
    val g = l.groupBy(col("l_returnflag")).agg(
      count(lit(1)).cast("double").as("n"),
      asD(sum(money(col("l_extendedprice")))).as("sx"),
      asD(sum(money(col("l_extendedprice")) * money(col("l_extendedprice")))).as("sxx"),
      asD(sum(money(col("l_quantity")))).as("sy"),
      asD(sum(money(col("l_quantity")) * money(col("l_quantity")))).as("syy"),
      asD(sum(money(col("l_extendedprice")) * money(col("l_quantity")))).as("sxy"))
    val mxx = col("n") * col("sxx") - col("sx") * col("sx")
    val myy = col("n") * col("syy") - col("sy") * col("sy")
    g.select(col("l_returnflag"),
      (mxx / (col("n") * (col("n") - lit(1.0)))).as("var_price"),
      sqrt(mxx / (col("n") * (col("n") - lit(1.0)))).as("stddev_price"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(mxx) * sqrt(myy))).as("corr_price_qty"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> (aggPricingSummary _),

    "agg_global" -> ((s, dir) =>
      load(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"), // integral-valued: exact
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        asD(sum(money(col("l_extendedprice")))).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))),

    "agg_count_distinct" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_partkey")),

    // HLL sketch: approximate by design, so no oracle (SURVEY §1.5 r4);
    // the ScalaTest suite asserts ±5% of the exact distinct count.
    "agg_approx_distinct" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))),

    // Mergeable Datasketches HLL (SURVEY §4.3): per-group sketch
    // binaries union-merged into one global estimate — the shape that
    // lets 100 TB of per-file/per-partition sketches combine without
    // rescanning. No oracle (sketches are engine-specific); ScalaTest
    // asserts the merged estimate within 5% of exact.
    "agg_hll_mergeable" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_agg(l_partkey)").as("sketch"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))")
          .as("merged_distinct"))),

    // Count-min sketch beside the HLL pair: the OTHER mergeable
    // sketch a 100 TB pipeline ships between stages — per-group
    // sketches built map-side, merged with count_min_sketch's binary
    // merge, probed for heavy-hitter estimates. Estimates are
    // seed-deterministic but engine-specific (no DuckDB twin) →
    // ✗-row; OpsSpec bounds the estimates against exact counts.
    "agg_count_min" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)").as("cms"))
        .select(col("l_returnflag"),
          length(col("cms")).cast("int").as("sketch_bytes"))
        .orderBy("l_returnflag")),

    "agg_grouping_sets" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    "agg_cube" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    "agg_rollup" -> ((s, dir) => {
      val n = load(s, dir, "nation")
      val r = load(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    "agg_stats" -> (aggStats _),

    "agg_bool_bit" -> ((s, dir) =>
      load(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(bool_and(col("p_size") > 1).as("all_big"),
          bool_or(col("p_size") > 45).as("any_huge"),
          bit_and(col("p_size")).as("band"),
          bit_or(col("p_size")).as("bor"))
        .orderBy("p_brand")),

    // PIVOT with a pinned value list (never values-inference — that's
    // an extra scan and nondeterministic column order at scale); long
    // sums are exact.
    "agg_pivot" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast("long")))
        .orderBy("l_linestatus")),

    // The SCALE path next to the exact sort-based percentile below:
    // approx_percentile's sketch is mergeable (map-side partials
    // combine), so it never globally sorts — the only viable form at
    // 100 TB. Approximate by design => no oracle (SURVEY §1.5 r4);
    // OpsSpec asserts each estimate within accuracy bounds of exact.
    "agg_approx_percentile" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)")
          .as("p"))
        .select(col("l_returnflag"), col("p").getItem(0).as("p50"),
          col("p").getItem(1).as("p99"))
        .orderBy("l_returnflag")),

    // Exact interpolated percentiles (sort-based, same linear
    // interpolation rule as DuckDB quantile_cont); integral-valued
    // quantities make the interpolation arithmetic exact.
    "agg_percentile_cont" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          expr("percentile(l_quantity, 0.99)").as("p99"))
        .orderBy("l_returnflag")),

    // Per-group sorted list, surfaced as a canonical joined string so
    // the compare is list-order-proof on both engines.
    "agg_collect_sorted" -> ((s, dir) =>
      load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(array_join(sort_array(collect_list(col("o_orderpriority"))), ",")
          .as("priorities"))
        .orderBy("o_custkey")),

    // Column profiling — the ETL data-quality staple: one row per
    // profiled column with row/null/distinct counts and min/max
    // (stringified AFTER the typed min/max so numeric semantics are
    // kept). One pass per column over a pruned scan; each aggregate
    // partially combines map-side.
    "agg_profile" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      def prof(c: String) =
        l.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
          .select(lit(c).as("column"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      prof("l_quantity")
        .unionAll(prof("l_extendedprice"))
        .unionAll(prof("l_returnflag"))
        .orderBy("column")
    }),

    // Deterministic per-group mode: most frequent value, lowest value
    // on ties (mode()'s tie choice is engine-specific, so the
    // count-then-rank formulation is spelled out identically in both
    // engines). Counts hash-aggregate map-side; the rank window runs
    // over the tiny (group, value) count table, never the fact rows.
    "agg_mode" -> ((s, dir) => {
      val counts = load(s, dir, "lineitem")
        .groupBy(col("l_linestatus"), col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_linestatus")
        .orderBy(desc("cnt"), asc("l_returnflag"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_linestatus"), col("l_returnflag").as("mode_flag"),
          col("cnt"))
        .orderBy("l_linestatus")
    }),

    // Fixed-width histogram: the bucket id is a per-row projection, so
    // the aggregate hash-partitions on ~50 buckets and partially
    // combines map-side — the same one-shuffle plan at any scale.
    // Bucket edges are exact: prices have 2 decimals and the edges are
    // integer multiples of 5000, both exactly representable as doubles.
    "agg_histogram" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 5000.0).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          asD(sum(money(col("l_extendedprice")))).as("sum_price"))
        .orderBy("bucket")),

    // Conditional (FILTER-clause) aggregates: several differently-
    // filtered measures in ONE pass over the fact table — the
    // alternative (one scan per measure + join) multiplies I/O by the
    // measure count, which is the difference between one and five
    // reads of a 100 TB table.
    "agg_filtered" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("total"),
          count(when(col("l_quantity") > 25, 1)).as("n_heavy"),
          asD(sum(when(col("l_linestatus") === "F",
            money(col("l_extendedprice"))))).as("rev_f"),
          countDistinct(when(col("l_linestatus") === "O",
            col("l_orderkey"))).as("n_orders_open"))
        .orderBy("l_returnflag")),

    // Quantity-weighted average price per flag: both the weighted sum
    // and the weight total accumulate in exact DECIMAL, so the final
    // double division is the ONLY float op — order-independent at any
    // partitioning. One map-side-combining aggregate.
    "agg_weighted" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          (asD(sum(money(col("l_extendedprice")) * money(col("l_quantity")))) /
            asD(sum(money(col("l_quantity"))))).as("wavg_price"),
          asD(sum(money(col("l_quantity")))).as("total_weight"))
        .orderBy("l_returnflag")),

    // arg-max/arg-min per group via max_by/min_by with a composite
    // (value, key) ordering struct — the unique key breaks value ties
    // deterministically. One hash aggregate; no window sort, no
    // self-join back onto the max.
    "agg_arg_max" -> ((s, dir) =>
      load(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(
          max_by(col("c_custkey"),
            struct(col("c_acctbal"), col("c_custkey"))).as("top_custkey"),
          max(col("c_acctbal")).as("top_acctbal"),
          min_by(col("c_custkey"),
            struct(col("c_acctbal"), col("c_custkey"))).as("bottom_custkey"),
          min(col("c_acctbal")).as("bottom_acctbal"))
        .orderBy("c_nationkey"))
  )

  val oracle: Map[String, String] = Map(
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST((1 - CAST(l_discount AS DECIMAL(15,2))) * (1 + CAST(l_tax AS DECIMAL(15,2))) AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_global" ->
      """SELECT count(*) AS n_rows,
        |  sum(l_quantity) AS sum_qty,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_rows
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    // Decimal sums are routed DECIMAL -> VARCHAR -> DOUBLE: DuckDB's
    // direct decimal-to-double cast double-rounds (int128 -> double,
    // then / 10^scale) and lands one ulp off Spark's correctly-rounded
    // BigDecimal conversion once the scaled integer exceeds 2^53 —
    // observed on sxx at sf0.001. The VARCHAR route parses the exact
    // digits, which IS correctly rounded (SURVEY §1.5 r7).
    "agg_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_extendedprice AS DECIMAL(15,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  (n * sxx - sx * sx) / (n * (n - 1.0)) AS var_price,
        |  sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) AS stddev_price,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_price_qty
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderpriority)), ',') AS priorities
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "agg_bool_bit" ->
      """SELECT p_brand,
        |  bool_and(p_size > 1) AS all_big,
        |  bool_or(p_size > 45) AS any_huge,
        |  CAST(bit_and(p_size) AS INT) AS band,
        |  CAST(bit_or(p_size) AS INT) AS bor
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "agg_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS A,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS N,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "agg_percentile_cont" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  quantile_cont(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_profile" ->
      """SELECT 'l_quantity' AS "column", count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT l_quantity) AS n_distinct,
        |  CAST(min(l_quantity) AS VARCHAR) AS min_s,
        |  CAST(max(l_quantity) AS VARCHAR) AS max_s
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(*),
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_extendedprice),
        |  CAST(min(l_extendedprice) AS VARCHAR),
        |  CAST(max(l_extendedprice) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(*),
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_returnflag),
        |  min(l_returnflag), max(l_returnflag)
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,

    "agg_mode" ->
      """SELECT l_linestatus, mode_flag, cnt FROM (
        |  SELECT l_linestatus, l_returnflag AS mode_flag, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_linestatus
        |      ORDER BY count(*) DESC, l_returnflag) AS rn
        |  FROM lineitem GROUP BY l_linestatus, l_returnflag) t
        |WHERE rn = 1 ORDER BY l_linestatus""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    "agg_filtered" ->
      """SELECT l_returnflag, count(*) AS total,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
        |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS rev_f,
        |  count(DISTINCT l_orderkey) FILTER (WHERE l_linestatus = 'O')
        |    AS n_orders_open
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_weighted" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
        |    CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) /
        |  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
        |    AS wavg_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
        |    AS total_weight
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_arg_max" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
        |  FROM customer)
        |SELECT c_nationkey,
        |  max(c_custkey) FILTER (WHERE rmax = 1) AS top_custkey,
        |  max(c_acctbal) AS top_acctbal,
        |  max(c_custkey) FILTER (WHERE rmin = 1) AS bottom_custkey,
        |  min(c_acctbal) AS bottom_acctbal
        |FROM r GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
