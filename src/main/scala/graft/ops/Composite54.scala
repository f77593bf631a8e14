package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.70 (round-25 batch 3) — approximate betweenness
  * centrality:
  *
  *  - [[betweennessApprox]]: seed-sampled Brandes betweenness over
  *    the symmetric co-purchase graph — the broker/bottleneck
  *    centrality the family still lacked (degree = volume, pagerank
  *    = endorsement mass, harmonic = reach; betweenness = "how much
  *    shortest-path traffic TRANSITS this node"). Exact Brandes is
  *    one BFS per node (O(V·E) — off the table at any scale), so
  *    this row pins the standard approximation: the SAME 3
  *    deterministic top-degree seeds harmonicOn samples (ties by
  *    node id), hop-≤3 BFS with EXACT BIGINT shortest-path counts
  *    σ, then Brandes' backward dependency accumulation
  *    δ(v) = Σ_{w ∈ succ(v)} σ_v/σ_w · (1 + δ(w)) over the BFS DAG
  *    (succ = edge + depth(w) = depth(v)+1), summed over seeds.
  *    Hop truncation means only ≤3-hop geodesics count — the same
  *    documented bound harmonic carries.
  *
  * Scale shape: the shortest-path loop discipline — per forward
  * round ONE (seed, node)-keyed σ-sum exchange with the frontier
  * size-gated-broadcast into the edge scan (graft.util.Hints; the
  * gate is one cached-block count of the checkpointed degree table,
  * bound seeds·|nodes|); per backward round one (seed, node)-keyed
  * δ-sum exchange with the two level tables riding the same gate.
  * Every level is localCheckpoint'd (each feeds 2-3 consumers:
  * the next frontier's anti-join, the backward pass, the union).
  * Since round 16 the forward pass lives in [[GraphBfs]]: the seed
  * rule and hop-≤3 σ-BFS are IDENTICAL to harmonic centrality's, so
  * the corpus-facing query reads the per-JVM parquet-materialized
  * levels ([[GraphBfs.sharedLevels]] — built once, fed to both
  * rows) and runs only the backward pass here; the backward gate
  * re-derives from the ACTUAL level sizes (Σ level rows ≤
  * seeds·|nodes|, parquet-metadata counts).
  *
  * Determinism: σ are exact BIGINTs (sums of path counts); δ is the
  * one double recursion, so every per-round δ rounds to 12 dp (the
  * pagerank grid discipline: engine sum-order drift ~1e-15 against
  * values ≥1e-3 rounds to the same grid point), the cross-seed sum
  * re-rounds to 12 dp, ordering uses that 12-dp value (ties by node
  * id), and the surfaced score takes the 6-dp floor.
  */
object Composite54 {

  private[graft] def betweennessOn(edges: DataFrame, seeds: Int,
      k: Int): DataFrame = {
    val (_, levels) = GraphBfs.levelsOn(edges, seeds, k)
    betweennessFrom(edges, levels)
  }

  /** Backward Brandes accumulation over pre-built BFS levels
    * (levels(d) = depth-d frontier (seed, node, sigma) from
    * [[GraphBfs]]). Gate re-derived from the actual level sizes:
    * every build side below is a level or delta table, bounded by
    * Σ level rows. */
  private[graft] def betweennessFrom(edges: DataFrame,
      levels: IndexedSeq[DataFrame], boundRows: Option[Long] = None): DataFrame = {
    val k = levels.length - 1
    // Gate bound: Σ level rows ≤ seeds·|nodes|. The corpus path passes
    // the bound from ONE parquet-metadata count of the shared degree
    // view (r19) instead of counting every level table — same bound,
    // k+1 fewer gate jobs per invocation.
    val hint = graft.util.Hints.maybeBroadcast(
      boundRows.getOrElse(levels.map(_.count()).sum))
    // Backward: δ(depth k) = 0; for d = k−1 .. 1 accumulate over the
    // DAG edges (v at depth d) → (w at depth d+1).
    var delta: DataFrame = null
    val deltas = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (d <- (k - 1) to 1 by -1) {
      val down = levels(d + 1)
      val cur = levels(d)
      val downD =
        if (delta == null)
          down.select(col("seed"), col("node"), col("sigma"),
            lit(0.0).as("dl"))
        else
          down.join(hint(delta), Seq("seed", "node"), "left")
            .select(col("seed"), col("node"), col("sigma"),
              coalesce(col("delta"), lit(0.0)).as("dl"))
      delta = {
        val agg = edges
          .join(hint(downD.select(col("seed"), col("node").as("dst"),
            col("sigma").as("sw"), col("dl"))), "dst")
          .join(hint(cur.select(col("seed"), col("node").as("src"),
            col("sigma").as("sv"))), Seq("seed", "src"))
          .groupBy(col("seed"), col("src").as("node"))
          .agg(expr("round(sum(CAST(sv AS DOUBLE)/sw * (1 + dl)), 12)")
            .as("delta"))
        // r19: the two DEEPEST rounds fuse into one action — δ(k−1)
        // feeds δ(k−2)'s join and the final union, and its aggregate
        // exchange is an identical subtree in both, which
        // ReuseExchange dedups (verified in the after-plan), so the
        // per-round checkpoint job bought nothing for them. Shallower
        // rounds (k > 3) still checkpoint: un-pinned, the plan would
        // double per round (guide §1.2 / VERDICT r18 item 1).
        if (d > 2) agg.localCheckpoint() else agg
      }
      deltas += delta
    }
    deltas.reduce(_ unionAll _)
      .groupBy(col("node"))
      .agg(expr("round(sum(delta), 12)").as("b"))
      .filter(col("b") > 0)
      .orderBy(desc("b"), col("node"))
      .limit(10)
      .selectExpr("node", "floor(b*1e6 + 0.5)/1e6 AS betweenness")
  }

  private def betweennessApprox(s: SparkSession, dir: String): DataFrame = {
    // Shared forward pass (GraphBfs.sharedLevels — parquet memo fed
    // to this row AND graph_harmonic_centrality); only the backward
    // pass needs the edge list. r19: the edge list is two 2-column
    // scans of the copurchase_half parquet view — re-reading it in
    // the two backward rounds is cheaper than a checkpoint job that
    // re-materializes 2E rows into block storage (guide §1.2), and
    // the gate bound comes from ONE metadata count of the shared
    // degree view (levels ≤ seeds·|nodes|) instead of 4 level counts.
    val (_, levels) = GraphBfs.sharedLevels(s, dir, seeds = 3, k = 3)
    betweennessFrom(
      Composite4.coPurchaseEdges(s, dir), levels,
      boundRows = Some(3L * TriCore.sharedDeg(s, dir).count()))
  }

  private val betweennessOracle = {
    // fℓ = the depth-ℓ frontier with exact σ; exclusion via
    // NOT EXISTS against every earlier level.
    def frontier(lvl: Int): String = {
      val excl = (0 until lvl).map(j =>
        s"""NOT EXISTS (SELECT 1 FROM f$j v
           |      WHERE v.seed = c.seed AND v.node = c.node)""".stripMargin)
        .mkString("\n    AND ")
      s"""f$lvl AS MATERIALIZED (
         |  SELECT c.seed, c.node, c.sigma FROM (
         |    SELECT p.seed, e.dst AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
         |    FROM e JOIN f${lvl - 1} p ON e.src = p.node
         |    GROUP BY 1, 2) c
         |  WHERE $excl)""".stripMargin
    }
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey),
       |deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS deg
       |        FROM e GROUP BY 1),
       |s AS MATERIALIZED (
       |  SELECT n AS seed FROM deg ORDER BY deg DESC, n LIMIT 3),
       |f0 AS MATERIALIZED (
       |  SELECT seed, seed AS node, CAST(1 AS BIGINT) AS sigma FROM s),
       |${frontier(1)},
       |${frontier(2)},
       |${frontier(3)},
       |b2 AS MATERIALIZED (
       |  SELECT f2.seed, f2.node,
       |    round(sum(CAST(f2.sigma AS DOUBLE)/f3.sigma * (1 + 0)), 12)
       |      AS delta
       |  FROM f2 JOIN e ON e.src = f2.node
       |    JOIN f3 ON f3.seed = f2.seed AND f3.node = e.dst
       |  GROUP BY 1, 2),
       |b1 AS MATERIALIZED (
       |  SELECT f1.seed, f1.node,
       |    round(sum(CAST(f1.sigma AS DOUBLE)/f2.sigma
       |      * (1 + coalesce(b2.delta, 0))), 12) AS delta
       |  FROM f1 JOIN e ON e.src = f1.node
       |    JOIN f2 ON f2.seed = f1.seed AND f2.node = e.dst
       |    LEFT JOIN b2 ON b2.seed = f2.seed AND b2.node = f2.node
       |  GROUP BY 1, 2),
       |bc AS (
       |  SELECT node, round(sum(delta), 12) AS b
       |  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
       |  GROUP BY 1)
       |SELECT node, floor(b*1e6 + 0.5)/1e6 AS betweenness
       |FROM bc WHERE b > 0
       |ORDER BY b DESC, node LIMIT 10""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_betweenness_approx" -> (betweennessApprox _)
  )

  val oracle: Map[String, String] = Map(
    "graph_betweenness_approx" -> betweennessOracle
  )
}
