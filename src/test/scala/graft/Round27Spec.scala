package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 (driver round) regression guards for the perf-repair work:
  *
  *  - the symmetric co-purchase edge list must be TWO projections of
  *    ONE materialized half-edge build (ADVICE r7: ReuseExchange was
  *    relied on for this and did not fire under AQE — every
  *    symmetric-graph consumer re-ran the groupBy+explode+distinct
  *    subtree per union branch);
  *
  *  - the bench's between-queries cleanup (clearCache + unpersist-all)
  *    must not change what any query computes — i.e. no query may
  *    depend on cross-invocation persisted state (the invariant the
  *    Bench.scala comment documents; ADVICE r7 asked for it to fail
  *    loudly instead of being silently mistimed).
  */
class Round27Spec extends AnyFunSuite {
  import TestSpark._

  test("coPurchaseEdges: both union branches read the SAME checkpointed half build") {
    val edges = graft.ops.Composite4.coPurchaseEdges(spark, sf)
    val leaves = edges.queryExecution.optimizedPlan.collectLeaves()
    val rddIds = leaves.collect { case l: LogicalRDD => l.rdd.id }
    assert(rddIds.length == 2,
      s"expected 2 LogicalRDD leaves (checkpointed half, twice), got ${leaves.mkString("; ")}")
    assert(rddIds.distinct.length == 1,
      s"union branches scan DIFFERENT materializations: rdd ids $rddIds")
  }

  test("queries are invariant to the bench's between-queries cleanup") {
    // The three shapes most tempted to lean on cross-invocation
    // state: an explicit .cache() user, an iterative persist loop,
    // and a localCheckpoint-heavy multi-consumer build.
    for (name <- Seq("cache_reuse", "graph_connected_components",
        "llm_dedup_cluster")) {
      val first = SparkEntry.queries(name)(spark, sf).collect().toSeq
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val second = SparkEntry.queries(name)(spark, sf).collect().toSeq
      assert(first == second,
        s"$name changed across the bench cleanup boundary")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
  }

  test("llm_dedup_near_verified and llm_dedup_near share one result surface") {
    val a = SparkEntry.queries("llm_dedup_near")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("llm_dedup_near_verified")(spark, sf).collect().toSeq
    assert(a == b, "twin rows must stay plan-identical")
  }
}
