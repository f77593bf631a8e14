package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.util.DistRank.globalNtile]] — SQL-ntile equality on
  * adversarial sizes, determinism, and the no-single-partition plan
  * promise backing `agg_ntile_distributed` and the three bounded
  * entity-scale ntile rows (VERDICT r8 item 5).
  */
class DistRankSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def reference(n: Int, buckets: Int) = {
    // Heavy ties: key = id/3, so tied keys straddle range-partition
    // boundaries unless the tie-breaker is honored.
    val df = spark.range(n.toLong).select(col("id"),
      (col("id") / 3).cast("long").as("k"))
    val want = df.withColumn("nt", ntile(buckets).over(
      Window.orderBy(col("k"), col("id"))).cast("bigint"))
    val got = graft.util.DistRank.globalNtile(df, "nt", buckets,
      Seq(col("k"), col("id")), parts = 4)
    (want.select("id", "nt"), got.select("id", "nt"))
  }

  test("globalNtile == SQL ntile: n%b>0, n<b, n=1, n=b, big") {
    for ((n, b) <- Seq((17, 5), (3, 10), (1, 4), (8, 8), (1000, 7))) {
      val (want, got) = reference(n, b)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"mismatch at n=$n buckets=$b")
    }
  }

  test("globalNtile: descending order matches SQL ntile") {
    val df = spark.range(97).select(col("id"),
      (col("id") % 13).cast("double").as("v"))
    val want = df.withColumn("nt", ntile(4).over(
      Window.orderBy(col("v").desc, col("id"))).cast("bigint"))
    val got = graft.util.DistRank.globalNtile(df, "nt", 4,
      Seq(col("v").desc, col("id")), parts = 4)
    assert(got.select("id", "nt").except(want.select("id", "nt")).isEmpty &&
      want.select("id", "nt").except(got.select("id", "nt")).isEmpty)
  }

  test("globalNtile: deterministic across reruns") {
    val df = spark.range(500).select(col("id"),
      (col("id") % 7).cast("long").as("k"))
    def run() = graft.util.DistRank.globalNtile(df, "nt", 9,
      Seq(col("k"), col("id")), parts = 8).select("id", "nt").collect().toSet
    assert(run() == run())
  }

  test("agg_ntile_distributed: no single-partition stage sees the entity input") {
    val df = SparkEntry.queries("agg_ntile_distributed")(spark, TestSpark.sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // The range exchange itself sits below the utility's lazy
    // checkpoint (visible as Scan ExistingRDD); above it, the rank
    // window must be __pid-partitioned, never bare.
    assert(plan.contains("Scan ExistingRDD") &&
      plan.contains("hashpartitioning(__pid"),
      s"rank pass must read the checkpointed range partitioning and window by __pid:\n$plan")
    val singles = plan.split("Exchange SinglePartition").drop(1)
    singles.foreach { seg =>
      // Bounded feeders only: the parts-row per-__pid count table or
      // the ≤10-row decile aggregate (share-of-total window). 1500
      // chars ≈ a few plan lines — windowspecdefinition rows are long.
      assert(seg.take(1500).contains("HashAggregate(keys=[__pid") ||
        seg.take(1500).contains("HashAggregate(keys=[decile"),
        s"a SinglePartition exchange must feed from a bounded aggregate:\n---\n${seg.take(1500)}\n---\n$plan")
    }
  }
}
