package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Typed `Dataset[T]` API surface (SURVEY §1.4): case-class encoders,
  * `groupByKey`/`reduceGroups`, and `joinWith`. The lambdas here are
  * JVM closures, NOT codegen'd expressions — that is the documented
  * cost of the typed API (each op deserializes InternalRow → case
  * class), which is why the engine uses it only where type safety
  * matters and keeps the relational ops in DataFrame algebra. The
  * SHAPE still scales: groupByKey shuffles on the key exactly like a
  * relational groupBy, and reduceGroups is a partial-aggregating
  * pairwise reduce (map-side combine), never a per-group collect.
  */
object Typed {

  case class Cust(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  case class Ord(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  /** Per-segment richest customer via typed reduceGroups: the reduce
    * keeps the row with the greatest (acctbal, custkey) — an argmax
    * as a pairwise-associative reduce, so Spark combines map-side. */
  def richestPerSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = load(s, dir, "customer").as[Cust]
    ds.groupByKey(_.c_mktsegment)
      .reduceGroups((a, b) =>
        if (a.c_acctbal > b.c_acctbal ||
          (a.c_acctbal == b.c_acctbal && a.c_custkey > b.c_custkey)) a else b)
      .map { case (seg, c) => (seg, c.c_custkey, c.c_acctbal) }
      .toDF("c_mktsegment", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment")
  }

  /** Typed joinWith: Dataset[(Ord, Cust)] pairs, projected back to
    * columns. Same physical join as the relational form — joinWith
    * only changes the result encoding. */
  def typedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = load(s, dir, "orders").as[Ord]
    val c = load(s, dir, "customer").as[Cust]
    o.joinWith(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .map { case (ord, cust) => (ord.o_orderkey, cust.c_name, ord.o_totalprice) }
      .toDF("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  case class OrdDay(o_custkey: Long, o_orderkey: Long, ed: Long)

  case class EpisodeRow(c_custkey: Long, episode: Long, n_orders: Long,
      first_day: Long, last_day: Long)

  /** Typed `flatMapGroups` with a planted per-group fold — the most
    * common typed escape hatch in real Spark code (VERDICT r12 next
    * item 3): per-customer order "episodes", maximal runs of orders
    * whose inter-order gap is ≤ 30 days, one output row per episode.
    * The group iterator is drained to an array and sorted by
    * (epoch_day, orderkey) — deterministic under ties — then folded
    * imperatively; per-group memory is bounded by the per-customer
    * order count (tens in this corpus; the same bound ANY
    * mapGroups/flatMapGroups carries, which is why the relational
    * twin below exists for unbounded keys). groupByKey shuffles on
    * custkey exactly like a relational groupBy; the date → epoch-day
    * projection happens in DataFrame algebra BEFORE the typed
    * boundary so the shuffled rows are 3 longs, not timestamps.
    * Customers are sliced to custkey % 10 == 0 to bound the output
    * (the audit's sampling knob, not a correctness device). */
  private[graft] def orderEpisodesOn(s: SparkSession, orders: DataFrame): DataFrame = {
    import s.implicits._
    val ds = orders
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"))
      .as[OrdDay]
    ds.groupByKey(_.o_custkey)
      .flatMapGroups { (k: Long, it: Iterator[OrdDay]) =>
        val sorted = it.toArray.sortBy(o => (o.ed, o.o_orderkey))
        val out = scala.collection.mutable.ArrayBuffer.empty[EpisodeRow]
        var episode = 0L; var n = 0L; var first = 0L; var last = 0L
        for (o <- sorted) {
          if (episode == 0L || o.ed - last > 30L) {
            if (episode > 0L) out += EpisodeRow(k, episode, n, first, last)
            episode += 1; n = 0L; first = o.ed
          }
          n += 1L; last = o.ed
        }
        if (episode > 0L) out += EpisodeRow(k, episode, n, first, last)
        out
      }
      .toDF()
      .orderBy("c_custkey", "episode")
  }

  def orderEpisodes(s: SparkSession, dir: String): DataFrame =
    orderEpisodesOn(s, load(s, dir, "orders"))

  case class OrdVal(o_custkey: Long, o_orderkey: Long, ed: Long, v: Double)

  /** Typed `mapGroups` with a planted order-dependent aggregation —
    * the ONE-row-per-group sibling of [[orderEpisodesOn]]: per
    * customer, the longest strictly-increasing streak of order
    * totals in (epoch_day, orderkey) order. The streak is a
    * sequential fold a relational aggregate cannot express directly
    * (the SQL twin needs the full gaps-and-islands cascade), which
    * is exactly when mapGroups earns its deserialization cost.
    * Same %10 slice and same per-group memory bound as the
    * flatMapGroups row. Totals are compared, never added, so DOUBLE
    * order values stay exact on both engines. */
  private[graft] def longestIncStreakOn(s: SparkSession, orders: DataFrame): DataFrame = {
    import s.implicits._
    val ds = orders
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"),
        col("o_totalprice").as("v"))
      .as[OrdVal]
    ds.groupByKey(_.o_custkey)
      .mapGroups { (k: Long, it: Iterator[OrdVal]) =>
        val sorted = it.toArray.sortBy(o => (o.ed, o.o_orderkey))
        var best = 1L; var cur = 1L
        for (i <- 1 until sorted.length) {
          if (sorted(i).v > sorted(i - 1).v) {
            cur += 1L; if (cur > best) best = cur
          } else cur = 1L
        }
        (k, sorted.length.toLong, best)
      }
      .toDF("c_custkey", "n_orders", "longest_inc_streak")
      .orderBy("c_custkey")
  }

  def longestIncStreak(s: SparkSession, dir: String): DataFrame =
    longestIncStreakOn(s, load(s, dir, "orders"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_reduce_groups" -> (richestPerSegment _),
    "ds_join_with" -> (typedJoin _),
    "ds_flatmap_groups" -> (orderEpisodes _),
    "ds_map_groups" -> (longestIncStreak _)
  )

  val oracle: Map[String, String] = Map(
    // argmax oracle: window top-1 by (acctbal, custkey) per segment
    "ds_reduce_groups" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |  FROM customer) WHERE rn = 1
        |ORDER BY c_mktsegment""".stripMargin,

    "ds_join_with" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // Window/group twin of the typed episode fold: the episode id is
    // a running sum of gap>30 break indicators over the same
    // (epoch_day, orderkey) order the typed fold sorts by.
    "ds_flatmap_groups" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS ed
        |  FROM orders WHERE o_custkey % 10 = 0),
        |lg AS (
        |  SELECT o_custkey, o_orderkey, ed,
        |    lag(ed) OVER (PARTITION BY o_custkey ORDER BY ed, o_orderkey)
        |      AS ped
        |  FROM o),
        |ep AS (
        |  SELECT o_custkey, ed,
        |    sum(CASE WHEN ped IS NULL OR ed - ped > 30 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY o_custkey ORDER BY ed, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS episode
        |  FROM lg)
        |SELECT o_custkey AS c_custkey, CAST(episode AS BIGINT) AS episode,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(ed) AS BIGINT) AS first_day,
        |  CAST(max(ed) AS BIGINT) AS last_day
        |FROM ep GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // Gaps-and-islands twin of the typed streak fold: non-increase
    // breaks open a new island; the longest island is the streak.
    "ds_map_groups" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS ed,
        |    o_totalprice AS v
        |  FROM orders WHERE o_custkey % 10 = 0),
        |lg AS (
        |  SELECT o_custkey, o_orderkey, ed, v,
        |    lag(v) OVER (PARTITION BY o_custkey ORDER BY ed, o_orderkey)
        |      AS pv
        |  FROM o),
        |grp AS (
        |  SELECT o_custkey,
        |    sum(CASE WHEN pv IS NULL OR v <= pv THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY o_custkey ORDER BY ed, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        |  FROM lg),
        |runs AS (
        |  SELECT o_custkey, g, CAST(count(*) AS BIGINT) AS run_len
        |  FROM grp GROUP BY 1, 2)
        |SELECT o_custkey AS c_custkey,
        |  CAST(sum(run_len) AS BIGINT) AS n_orders,
        |  CAST(max(run_len) AS BIGINT) AS longest_inc_streak
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
