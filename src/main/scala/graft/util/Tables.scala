package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + oracle-determinism helpers.
  *
  * The reference snapshot (/root/reference/LICENSE:1-201 is its only
  * file) defines no data model; the corpus in TESTDATA.md does. Every
  * query in this engine is a pure function of (SparkSession, sfDir)
  * reading these parquet tables.
  *
  * Determinism rules (SURVEY.md §1.5): money aggregates go through
  * exact DECIMAL accumulation and are surfaced as DOUBLE so that Spark
  * and the DuckDB oracle produce bit-identical values regardless of
  * partial-aggregation order.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read it as nanos-since-epoch (the
    * `nanosAsLong` flag, set once in the Verify/Bench session
    * builders) and convert to the session µs timestamp. The corpus'
    * ts values are µs-resolution [verified: every ns value % 1000 ==
    * 0], so the ns->µs conversion is LOSSLESS and DuckDB (which keeps
    * ns) agrees exactly; oracles exposing ts cast to TIMESTAMP (µs).
    *
    * The conf.set below is a defensive no-op under our own sessions
    * (builders already set it) and exists for driver-owned sessions;
    * it always sets the same constant, so there is no read-order race.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** NOTE (data reality, verified): lineitem's (l_orderkey,
    * l_linenumber) is NOT unique in this corpus — any deterministic
    * ordering over lineitem rows must sort by the FULL output tuple. */
  val lineitemCols: Seq[String] = Seq("l_orderkey", "l_partkey",
    "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  /** Exact fixed-point view of a money/rate double column. 15,2 keeps
    * products of two/three operands inside DECIMAL(38,_) in both Spark
    * and DuckDB (their precision-propagation rules differ above that).
    */
  def money(c: Column): Column = c.cast("decimal(15,2)")

  /** Final surface type for any aggregate that went through decimal
    * accumulation: one deterministic decimal->IEEE754 rounding on both
    * engines. */
  def asD(c: Column): Column = c.cast("double")
}
