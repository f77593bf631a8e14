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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_reduce_groups" -> (richestPerSegment _),
    "ds_join_with" -> (typedJoin _)
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
        |ORDER BY o_orderkey""".stripMargin
  )
}
