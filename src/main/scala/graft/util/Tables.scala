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
