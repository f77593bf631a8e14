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

  test("graph_connected_components_conv: fixpoint labels partition every node") {
    val conv = SparkEntry.queries("graph_connected_components_conv")(spark, sf)
      .collect()
    assert(conv.nonEmpty)
    val nNodes = graft.ops.Composite4.coPurchaseEdges(spark, sf)
      .select("src").distinct().count()
    assert(conv.map(_.getLong(1)).sum == nNodes,
      "component sizes must sum to the node count")
    // every component label is the component's own minimum node id —
    // a label that were not a member would violate min-label semantics
    assert(conv.map(_.getLong(0)).distinct.length == conv.length)
  }

  test("dq_constraint_check: one row per declared constraint, counts non-negative") {
    val rows = SparkEntry.queries("dq_constraint_check")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getString(0)).distinct.length == 10)
    assert(rows.forall(_.getLong(1) >= 0))
  }

  test("dq_uniqueness_audit: surfaces the known lineitem composite-key duplicates") {
    val rows = SparkEntry.queries("dq_uniqueness_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.size == 10)
    // declared-unique single-column keys hold in this corpus
    for ((e, (n, k, d)) <- rows if e != "lineitem.l_orderkey+l_linenumber") {
      assert(d == 0 && n == k, s"$e expected unique, got $n rows / $k keys")
    }
    // the documented non-unique tuple must show a NON-zero dup count
    // (Tables.lineitemCols note) — an audit that can't see it is broken
    val (n, k, d) = rows("lineitem.l_orderkey+l_linenumber")
    assert(d > 0 && d == n - k, s"expected duplicates, got $n/$k/$d")
  }

  test("dq_freshness: freshest type has lag 0; trailing window bounded by total") {
    val rows = SparkEntry.queries("dq_freshness")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(3) == 0L), "some type must carry the corpus max")
    assert(rows.forall(r => r.getLong(4) <= r.getLong(1)))
    assert(rows.forall(r => r.getLong(3) >= 0L))
  }

  test("llm_dedup_near_verified and llm_dedup_near share one result surface") {
    val a = SparkEntry.queries("llm_dedup_near")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("llm_dedup_near_verified")(spark, sf).collect().toSeq
    assert(a == b, "twin rows must stay plan-identical")
  }
}
