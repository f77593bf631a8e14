package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-16 operators (SURVEY §2.37-41):
  * the broadcasts, rank-filter limits, and integer-only pair scans
  * those rows promise, held against the executed plan.
  */
class Round16PlanSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.count() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("graph_connected_components: iterative lineage is materialization-truncated") {
    // The per-round broadcast joins run in their OWN jobs; the final
    // aggregate must read the last round's MATERIALIZED labels
    // (r8: persist() — the InMemoryRelation body still DISPLAYS the
    // build tree, but execution scans the cache) instead of replaying
    // a 6-round join tree per action. So: a materialization boundary
    // must exist, and no join may sit ABOVE it.
    val plan = executed("graph_connected_components")
    val boundary = Seq("InMemoryTableScan", "Scan ExistingRDD")
      .map(plan.indexOf).filter(_ >= 0)
    assert(boundary.nonEmpty,
      s"final aggregate must read materialized labels:\n$plan")
    val aboveBoundary = plan.substring(0, boundary.min)
    assert(!aboveBoundary.contains("Join"),
      s"a join above the materialization boundary replays the round tree:\n$plan")
  }

  test("evt_concurrency_peak: peak lookup broadcasts; one window per type") {
    val plan = executed("evt_concurrency_peak")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 5-row peak side must broadcast:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"sweep-line running sum missing:\n$plan")
  }

  test("llm_mmr_rerank: greedy rounds read checkpointed candidates, not corpus rescans") {
    // cand/pairs localCheckpoint once; five greedy rounds then never
    // rescan embeddings — the final plan roots at the checkpointed
    // selection, and no parquet scan survives into it.
    val plan = executed("llm_mmr_rerank")
    assert(plan.contains("Scan ExistingRDD"),
      s"selection must read the checkpointed frames:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"a parquet scan in the final plan means the corpus is rescanned per action:\n$plan")
  }

  test("llm_simsearch_hamming: pair scan compares packed words, not float arrays") {
    val df = SparkEntry.queries("llm_simsearch_hamming")(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bit_count"),
      s"hamming must run on bit_count(xor):\n$plan")
    val joinPart = plan.split("NestedLoopJoin|BroadcastHashJoin").last
    assert(!joinPart.contains("CosineSim"),
      "no float kernel may survive into the pair scan")
  }

  test("agg_power_mde / evt_uplift_cuped: 1-row scalars ride broadcasts") {
    assert(executed("agg_power_mde").contains("BroadcastNestedLoopJoin"),
      "the 1-row totals side must broadcast")
    assert(executed("evt_uplift_cuped").contains("BroadcastNestedLoopJoin"),
      "the 1-row split/theta sides must broadcast")
  }

  test("llm_dedup_incremental: bloom probe prunes the incoming scan BEFORE the verify join") {
    // The generation-boundary promise: might_contain(bloom subquery)
    // sits in the incoming side's scan filter, so only suspected-seen
    // rows ever reach the exact LeftSemi verify shuffle.
    val plan = executed("llm_dedup_incremental")
    val joinAt = plan.indexOf("LeftSemi")
    assert(joinAt >= 0, s"exact left-semi verify join missing:\n$plan")
    assert(plan.contains("might_contain"),
      s"bloom probe missing from the plan:\n$plan")
    assert(plan.substring(joinAt).contains("might_contain"),
      s"bloom probe must filter the scan BELOW the verify join, not above it:\n$plan")
  }

  test("llm_dedup_minhash_cluster: CC lineage is materialization-truncated") {
    // Same contract as graph_connected_components: the final aggregate
    // reads the last round's materialized labels, never a replayed
    // multi-round join tree.
    val plan = executed("llm_dedup_minhash_cluster")
    val boundary = Seq("InMemoryTableScan", "Scan ExistingRDD")
      .map(plan.indexOf).filter(_ >= 0)
    assert(boundary.nonEmpty,
      s"final aggregate must read materialized labels:\n$plan")
    assert(!plan.substring(0, boundary.min).contains("Join"),
      s"a join above the materialization boundary replays the round tree:\n$plan")
  }

  test("agg_skyline: point-set window is bucket-partitioned; single-partition data is aggregate-bounded") {
    // The r8 plan ran ONE global window over all distinct order points
    // (single-partition sort = the scale-killer). The r9 plan must
    // (a) window the point set partitioned by price bucket, and
    // (b) only ever single-partition the ≤256-row per-bucket aggregate.
    val plan = executed("agg_skyline")
    assert(plan.contains("hashpartitioning(bkt"),
      s"point-set window must be bucket-partitioned:\n$plan")
    val singles = plan.split("Exchange SinglePartition").drop(1)
    assert(singles.nonEmpty, "the 256-row prefix-max window should exist")
    singles.foreach { seg =>
      // Bounded feeders: the ≤256-row per-bucket aggregate, or a
      // partial-aggregated global scalar (≤ #partitions rows).
      assert(seg.take(600).contains("HashAggregate(keys=[bkt") ||
        seg.take(600).contains("HashAggregate(keys=[], functions=[partial_"),
        s"a SinglePartition exchange must feed from a bounded aggregate, not the point set:\n$plan")
    }
  }

  test("scan_date_dim: generator explodes from a 1-row aggregate, no fact rescans") {
    val plan = executed("scan_date_dim")
    assert(plan.contains("Generate explode"),
      s"calendar must come from sequence()+explode:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one orders scan, got $scans:\n$plan")
  }
}
