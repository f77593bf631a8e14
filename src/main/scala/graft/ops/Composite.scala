package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.12 — composite analytics queries: classic TPC-H query
  * shapes (Q3/Q5/Q10 adapted to this corpus' columns and date range)
  * plus a bucketed co-located join. These exercise the multi-operator
  * paths a reference-engine user actually runs — join trees + selective
  * filters + decimal aggregation + top-k — end to end, the way single
  * -operator rows can't.
  *
  * Scale notes:
  *  - Fact-side tables (lineitem, orders) join shuffled on their keys;
  *    dimension tables (customer at this corpus' scale ratio, nation,
  *    region) go through `broadcast()` so the fact side never
  *    re-shuffles for them.
  *  - Selective date/segment filters sit directly on the scans, so
  *    Parquet row-group pruning and column pruning both apply before
  *    the first join.
  *  - Revenue arithmetic follows §1.5: exact DECIMAL accumulation,
  *    surfaced as DOUBLE only at the end.
  *  - `join_bucketed` pre-buckets both sides on the join key with the
  *    same bucket count — the join then needs NO exchange at any data
  *    size (the 100 TB answer to a repeated large-large equi-join; at
  *    cluster scale the bucketed tables live in the warehouse and every
  *    downstream join on that key is shuffle-free).
  */
object Composite {

  /** Per-line discounted revenue — THE decimal-exactness-critical
    * product (15,2 × 8,4 parenthesization, SURVEY §1.5); every
    * revenue aggregate in this file derives from this one
    * definition. */
  private val lineRev =
    money(col("l_extendedprice")) *
      (lit(1) - money(col("l_discount"))).cast("decimal(8,4)")

  private val rev = asD(sum(lineRev))

  private val revSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4))) AS DOUBLE)"

  // TPC-H Q3 (shipping priority): unshipped-as-of-cutoff revenue per
  // order for one market segment, top 10 by revenue.
  private def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01"
    val c = load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = load(s, dir, "orders").filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
    val l = load(s, dir, "lineitem").filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(rev.as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  // TPC-H Q5 (local supplier volume): revenue in one region from
  // orders where the supplier and customer share a nation.
  private def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    val c = load(s, dir, "customer")
    val o = load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val l = load(s, dir, "lineitem")
    val su = load(s, dir, "supplier")
    val n = load(s, dir, "nation")
    val r = load(s, dir, "region").filter(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(rev.as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  // TPC-H Q10 (returned-item reporting): revenue lost to returns per
  // customer over one year, top 20 customers.
  private def tpchQ10(s: SparkSession, dir: String): DataFrame = {
    val c = load(s, dir, "customer")
    val o = load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val n = load(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(rev.as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
  }

  // TPC-H Q14 (promotion effect): share of one month's revenue from
  // PROMO parts. part is the small side — broadcast — so the only
  // shuffle is the final single-row aggregate. The ratio is computed
  // in DOUBLE after exact decimal accumulation of both sums, with
  // identical parenthesization on both engines.
  private def tpchQ14(s: SparkSession, dir: String): DataFrame = {
    val l = load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    val p = load(s, dir, "part")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        (asD(sum(when(col("p_type").startsWith("PROMO"), lineRev))) /
          asD(sum(lineRev)))).as("promo_share"))
  }

  // TPC-H Q18 (large-volume customers): orders whose total quantity
  // exceeds a threshold, with their customer. The HAVING aggregate
  // hashes lineitem on l_orderkey once; the survivor set is tiny, so
  // it broadcasts INTO orders and customer joins rather than
  // shuffling them.
  private def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = load(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(money(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 150)
    load(s, dir, "orders")
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(load(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), asD(col("qty")).as("total_qty"))
      .orderBy(desc("total_qty"), asc("o_orderkey"))
      .limit(20)
  }

  // TPC-H Q6 (forecasting revenue change): pure filter + single-row
  // aggregate — the canonical pushdown showcase. All three predicates
  // reach the parquet scan (PushedFilters), so at 100 TB the stage
  // reads only matching row groups and shuffles ONE partial-sum row.
  private def tpchQ6(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(asD(sum(money(col("l_extendedprice")) * money(col("l_discount"))))
        .as("revenue"))

  // TPC-H Q13 (customer distribution): order counts per customer
  // (LEFT join keeps the zero-order customers), then the distribution
  // of those counts. Two chained hash aggregates; the second one's
  // input is already tiny.
  private def tpchQ13(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .join(load(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  // TPC-H Q19 (discounted revenue): disjunctive brand/size/quantity
  // predicate bands. The OR tree cannot push past the join, but each
  // band's part-side conjuncts prune the broadcast build side, and
  // the lineitem quantity range (the OR hull) is pushed to the scan.
  private def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    val l = load(s, dir, "lineitem")
    val p = load(s, dir, "part")
    val band1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
    val band2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
    val band3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(band1 || band2 || band3)
      .agg(rev.as("revenue"))
  }

  // TPC-H Q12 adapted to this corpus (no l_shipmode/commitdate
  // columns): late-shipment counts — lineitems shipped more than 60
  // days after their order date — per order priority. One shuffled
  // fact-fact join on orderkey, then a counted CASE aggregate.
  private def lateShipments(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      .join(load(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(when(
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        1)).as("late"),
        count(lit(1)).as("total"))
      .orderBy("o_orderpriority")

  /** Bucketed co-located join: both sides written CLUSTERED BY the
    * join key into the session warehouse with the same bucket count,
    * then joined — the executed plan has no shuffle over either scan
    * (asserted by OpsSpec). Result is the same per-customer rollup a
    * plain join produces, so the plain-SQL oracle checks it exactly. */
  private[graft] def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val buckets = 8
    // Deterministic per-sfDir table names: Verify and Bench may drive
    // different sf dirs through one session. The tag encodes the FULL
    // dir (sanitized), not a hash — hashCode collisions would silently
    // reuse another dir's bucketed data.
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val ot = s"graft_bkt_orders_$tag"
    val ct = s"graft_bkt_customer_$tag"
    // The in-memory catalog forgets tables across JVMs while their
    // warehouse directories persist — clear any stale location before
    // (re)writing, or saveAsTable throws LOCATION_ALREADY_EXISTS.
    def writeBucketed(table: String, src: => DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(table)) {
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + "/" + table)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        src.write.mode("overwrite")
          .bucketBy(buckets, key).sortBy(key)
          .saveAsTable(table)
      }
    writeBucketed(ot,
      load(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey")
    writeBucketed(ct,
      load(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey"),
      "c_custkey")
    s.table(ot).join(s.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        asD(sum(money(col("o_totalprice")))).as("total_spend"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_tpch_q3" -> (tpchQ3 _),
    "sql_tpch_q5" -> (tpchQ5 _),
    "sql_tpch_q10" -> (tpchQ10 _),
    "sql_tpch_q6" -> (tpchQ6 _),
    "sql_tpch_q13" -> (tpchQ13 _),
    "sql_tpch_q14" -> (tpchQ14 _),
    "sql_tpch_q18" -> (tpchQ18 _),
    "sql_tpch_q19" -> (tpchQ19 _),
    "sql_late_shipments" -> (lateShipments _),
    "join_bucketed" -> (bucketedJoin _)
  )

  val oracle: Map[String, String] = Map(
    "sql_tpch_q3" ->
      s"""SELECT l_orderkey, $revSql AS revenue, o_orderdate, o_orderpriority
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "sql_tpch_q5" ->
      s"""SELECT n_name, $revSql AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "sql_tpch_q10" ->
      s"""SELECT c_custkey, c_name, $revSql AS revenue, c_acctbal, n_name
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "sql_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
        |  CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "sql_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "sql_tpch_q19" ->
      s"""SELECT $revSql AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "sql_tpch_q14" ->
      """SELECT 100.0 * (
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice AS DECIMAL(15,2)) *
        |      CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4)) END)
        |    AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
        |      CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4)))
        |    AS DOUBLE)) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    "sql_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(15,2))) AS qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(15,2))) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,

    "sql_late_shipments" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |    AS late,
        |  count(*) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "join_bucketed" ->
      """SELECT c_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin
  )
}
