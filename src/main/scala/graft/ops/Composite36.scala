package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.52 (round-23 batch 1) — link prediction and
  * centrality structure over the co-purchase graph:
  *
  *  - [[jaccardLinkpred]]: Jaccard-coefficient link prediction — the
  *    top-20 NON-adjacent part pairs by |N(u)∩N(v)| / |N(u)∪N(v)|,
  *    scored on a deterministic candidate slice (both endpoints
  *    n % 20 == 0). graph_common_neighbors counts shared neighbors
  *    of EXISTING edges; this ranks the edges that do not exist yet,
  *    the recommender/candidate-generation question.
  *
  *  - [[richClub]]: rich-club coefficient curve φ(k) for k = 1..8 —
  *    do high-degree nodes preferentially connect to each other?
  *    N_k nodes of degree > k, E_k edges with BOTH endpoints of
  *    degree > k, φ(k) = 2E_k / (N_k(N_k−1)).
  *
  *  - [[harmonicCentrality]]: hop-bounded (≤3) harmonic closeness of
  *    the 3 highest-degree hubs — Σ 1/d over nodes reached within 3
  *    hops, the centrality leaderboard row (`graph_shortest_path`'s
  *    multi-source histogram cannot rank individual seeds).
  *
  * Scale shapes: the wedge generation behind Jaccard is the sorted-
  * set pair explosion of coPurchaseHalfEdges restricted to the
  * candidate slice BEFORE pairing, so per-middle fan-out is
  * (slice-degree choose 2) ≈ Σdeg²/400, not the full Σdeg² wedge
  * blow-up (the llm_minhash_calibration sampling discipline: the
  * slice bounds the constant factor; a hub-degree cap would bound
  * the asymptote if ever needed). Rich-club reduces the edge list to
  * two bounded histograms (distinct degrees) before the 8-row k
  * table touches anything. Harmonic centrality rides the
  * shared seed/BFS levels ([[GraphBfs]], round 16): the σ-BFS runs
  * once per corpus (parquet-memoized, also feeding
  * graph_betweenness_approx) with its per-round builds size-gated
  * (graft.util.Hints; past the cap the rounds run un-hinted as
  * keyed shuffles instead of hard-failing at the broadcast limit);
  * the row itself is a level-count aggregate over frontiers.
  *
  * Determinism: every count/degree/distance is an exact integer;
  * harmonic sums are kept as Σ 6 DIV d (d ∈ 1..3 divides 6 exactly)
  * and leave the integers once; Jaccard/φ assemble once in double,
  * floor-form 6-dp (§1.5); top-20 and seed picks tie-break on full
  * integer keys so LIMIT is engine-deterministic.
  */
object Composite36 {

  /** Candidate slice modulus for link prediction: both pair endpoints
    * must satisfy n % Slice == 0. */
  private val Slice = 20

  /** Per-middle candidate cap (ADVICE r12 item 3): the wedge
    * explosion is O(slice-degree²) inside ONE task, and Slice only
    * divides the constant — a hub whose slice-neighborhood grows
    * with SF still produces an unbounded single-task blow-up. Each
    * middle therefore scores only its `SliceCap` SMALLEST
    * slice-neighbors (deterministic, mirrored in the oracle via
    * row_number ≤ cap), bounding every task at SliceCap²/2 pairs.
    * At the current corpus no slice-neighborhood comes near 256, so
    * the cap is a pure guard (results unchanged, asserted by the
    * tri-SF oracle runs); past it the row is explicitly a capped
    * approximation, like every seed-sampled graph row. */
  private val SliceCap = 256

  private val MaxK = 8

  // ---- graph_jaccard_linkpred ------------------------------------------
  // Wedges (a, z, b) with a < b and a, b in the slice, generated once
  // per unordered pair per middle via the sorted-set posexplode
  // discipline; cn(a,b) = wedge count; existing edges dropped by
  // left_anti against the half-edge list; Jaccard = cn / (deg_a +
  // deg_b − cn) on FULL degrees (the slice restricts which pairs are
  // scored, never the neighborhoods they are scored on).
  /** Shared link-prediction candidate table (round 16): the
    * non-adjacent slice pairs with everything BOTH scoring rows need
    * — (src, dst, common_neighbors, deg_src, deg_dst, aa) — built
    * once from the wedge explosion WITH the middle kept (so the
    * Adamic-Adar weight Σ 1/ln(deg z) falls out of the same pass
    * that counts the wedges). `graph_jaccard_linkpred` (here) and
    * `graph_adamic_adar_linkpred` (Composite69) are projections +
    * TakeOrdered over this one relation; the corpus-facing queries
    * read it through the [[DiskMemo]] parquet materialization. */
  private[graft] def linkpredCandidatesOn(half: DataFrame,
      degOpt: Option[DataFrame] = None): DataFrame = {
    val sym = half.unionAll(
      half.select(col("dst").as("src"), col("src").as("dst")))
    // r18: the corpus path passes the shared TriCore degree view;
    // planted callers let the seam build it (three consumers: middle
    // weight, deg_src, deg_dst).
    val deg = degOpt.getOrElse(
      sym.groupBy(col("src").as("n")).agg(count(lit(1)).as("deg"))
        .localCheckpoint())
    val wedges = sym.filter(col("dst") % Slice === 0)
      .groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ps0"))
      .select(col("src").as("z"), slice(col("ps0"), 1, SliceCap).as("ps"))
      .select(col("z"), col("ps"), posexplode(col("ps")))
      .toDF("z", "ps", "i", "a")
      .select(col("z"), col("a"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps"))))
          .as("b"))
    val cn = wedges
      .join(deg.select(col("n").as("z"), col("deg").as("zdeg")), "z")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        // Fixed round-12 keeps the materialized table summation-order
        // independent (DiskMemo's determinism contract): a fresh build
        // and a memo read-back must be cell-identical even when the
        // partial-sum order differs; downstream surfaces floor at 1e-6
        // so the 1e-12 snap is invisible to every consumer.
        expr("round(sum(1.0/ln(CAST(zdeg AS DOUBLE))), 12)").as("aa"))
    cn.join(half.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .join(deg.select(col("n").as("a"), col("deg").as("deg_src")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("deg_dst")), "b")
      .selectExpr("a AS src", "b AS dst", "common_neighbors",
        "deg_src", "deg_dst", "aa")
  }

  private[graft] def sharedLinkpredCandidates(s: SparkSession,
      dir: String): DataFrame =
    DiskMemo.table(s, dir, "linkpred_cands")(linkpredCandidatesOn(
      Composite4.coPurchaseHalfEdges(s, dir),
      degOpt = Some(TriCore.sharedDeg(s, dir))))

  /** Jaccard projection over the shared candidates (planted-graph
    * test seam builds its own candidates, no disk). */
  private[graft] def jaccardFromCandidates(cands: DataFrame): DataFrame =
    cands.selectExpr("src", "dst", "common_neighbors",
        "deg_src", "deg_dst",
        """floor((CAST(common_neighbors AS DOUBLE)
          | / (deg_src + deg_dst - common_neighbors))*1e6 + 0.5)/1e6
          | AS jaccard""".stripMargin)
      .orderBy(col("jaccard").desc, col("src"), col("dst"))
      .limit(20)

  private[graft] def jaccardLinkpredOn(half: DataFrame): DataFrame =
    jaccardFromCandidates(linkpredCandidatesOn(half))

  private def jaccardLinkpred(s: SparkSession, dir: String): DataFrame =
    jaccardFromCandidates(sharedLinkpredCandidates(s, dir))

  private val jaccardLinkpredOracle =
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |h AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey < b.l_partkey),
       |e AS MATERIALIZED (
       |  SELECT src, dst FROM h UNION ALL SELECT dst, src FROM h),
       |deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS deg
       |        FROM e GROUP BY 1),
       |sn AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
       |    FROM e WHERE dst % $Slice = 0)
       |  WHERE rn <= $SliceCap),
       |w AS (
       |  SELECT a.dst AS src, b.dst AS dst,
       |    CAST(count(*) AS BIGINT) AS common_neighbors
       |  FROM sn a JOIN sn b ON a.src = b.src AND a.dst < b.dst
       |  GROUP BY 1, 2),
       |nw AS (SELECT w.* FROM w WHERE NOT EXISTS (
       |  SELECT 1 FROM h WHERE h.src = w.src AND h.dst = w.dst))
       |SELECT nw.src, nw.dst, common_neighbors,
       |  da.deg AS deg_src, db.deg AS deg_dst,
       |  floor((CAST(common_neighbors AS DOUBLE)
       |   / (da.deg + db.deg - common_neighbors))*1e6 + 0.5)/1e6
       |   AS jaccard
       |FROM nw JOIN deg da ON nw.src = da.n JOIN deg db ON nw.dst = db.n
       |ORDER BY jaccard DESC, nw.src, nw.dst LIMIT 20""".stripMargin

  // ---- graph_rich_club -------------------------------------------------
  // The edge list collapses to two small histograms — node count per
  // degree and edge count per min-endpoint-degree — before the 8-row
  // k table sees anything; E_k / N_k are conditional sums over those
  // histograms (non-equi left joins on 8 × |distinct degrees| rows),
  // so the curve costs two keyed aggregates regardless of scale.
  private[graft] def richClubOn(half: DataFrame): DataFrame =
    richClubCore(half, TriCore.degOn(half).localCheckpoint())

  private[graft] def richClubCore(half: DataFrame, deg: DataFrame): DataFrame = {
    val nodeH = deg.groupBy(col("deg")).agg(count(lit(1)).as("ncnt"))
    val edgeH = half
      .join(deg.select(col("n").as("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("n").as("dst"), col("deg").as("ddst")), "dst")
      .select(least(col("dsrc"), col("ddst")).as("mindeg"))
      .groupBy(col("mindeg")).agg(count(lit(1)).as("ecnt"))
    val ks = half.agg(count(lit(1)).as("ign"))
      .select(explode(array((1 to MaxK).map(i => lit(i.toLong)): _*)).as("k"))
    val nk = ks.join(broadcast(nodeH), col("deg") > col("k"), "left")
      .groupBy(col("k"))
      .agg(coalesce(sum(col("ncnt")), lit(0L)).as("n_nodes"))
    val ek = ks.join(broadcast(edgeH), col("mindeg") > col("k"), "left")
      .groupBy(col("k"))
      .agg(coalesce(sum(col("ecnt")), lit(0L)).as("n_edges"))
    nk.join(ek, "k")
      .selectExpr("k", "n_nodes", "n_edges",
        """floor((2.0 * n_edges
          | / nullif(CAST(n_nodes AS DOUBLE) * (n_nodes - 1), 0))*1e6
          | + 0.5)/1e6 AS phi""".stripMargin)
      .orderBy("k")
  }

  private def richClub(s: SparkSession, dir: String): DataFrame =
    // r18: half edges + degrees from the shared DiskMemo parquet views
    richClubCore(Composite4.coPurchaseHalfEdges(s, dir),
      TriCore.sharedDeg(s, dir))

  private val richClubOracle = {
    val ks = (1 to MaxK).map(i => s"($i)").mkString(",")
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |h AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey < b.l_partkey),
       |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
       |  (SELECT src AS n FROM h UNION ALL SELECT dst FROM h)
       |  GROUP BY 1),
       |nh AS (SELECT deg, CAST(count(*) AS BIGINT) AS ncnt
       |       FROM deg GROUP BY 1),
       |eh AS (SELECT least(ds.deg, dd.deg) AS mindeg,
       |         CAST(count(*) AS BIGINT) AS ecnt
       |       FROM h JOIN deg ds ON h.src = ds.n
       |              JOIN deg dd ON h.dst = dd.n
       |       GROUP BY 1),
       |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES $ks) t(k)),
       |nk AS (SELECT k, CAST(coalesce(sum(ncnt), 0) AS BIGINT) AS n_nodes
       |       FROM ks LEFT JOIN nh ON deg > k GROUP BY 1),
       |ek AS (SELECT k, CAST(coalesce(sum(ecnt), 0) AS BIGINT) AS n_edges
       |       FROM ks LEFT JOIN eh ON mindeg > k GROUP BY 1)
       |SELECT k, n_nodes, n_edges,
       |  floor((2.0 * n_edges
       |   / nullif(CAST(n_nodes AS DOUBLE) * (n_nodes - 1), 0))*1e6
       |   + 0.5)/1e6 AS phi
       |FROM nk JOIN ek USING (k) ORDER BY k""".stripMargin
  }

  // ---- graph_harmonic_centrality ---------------------------------------
  // Seeds = the 3 highest-degree nodes (ties by node id — an exact
  // integer TakeOrdered, never a sample). Since round 16 the
  // traversal is GraphBfs' shared σ-BFS (identical seed rule and
  // hop-≤3 levels to graph_betweenness_approx — VERDICT r15 item 3):
  // each reached (seed, node) sits in exactly one level = its hop
  // distance, so the distance histogram is a level-count aggregate —
  // the old dense (seeds × nodes) Bellman-Ford table is gone.
  // Harmonic mass stays integral as Σ 6 DIV d until the single
  // double assembly.
  private[graft] def harmonicOn(edges: DataFrame, seeds: Int, k: Int): DataFrame = {
    val (seedRows, levels) = graft.ops.GraphBfs.levelsOn(edges, seeds, k)
    harmonicFrom(seedRows, levels)
  }

  /** Distance-histogram assembly over pre-built BFS levels
    * (levels(d) = depth-d frontier from [[GraphBfs]]; depth IS the
    * hop distance). k = 3 shaped, like the row it feeds: the 6 DIV d
    * integral mass is exact for d ∈ 1..3. */
  private[graft] def harmonicFrom(seedRows: DataFrame,
      levels: IndexedSeq[DataFrame]): DataFrame = {
    val reach = (1 until levels.length).map { d =>
        levels(d).select(col("seed"), lit(d.toLong).as("d"))
      }.reduce(_ unionAll _)
      .groupBy(col("seed"))
      .agg(sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_d1"),
        sum(when(col("d") === 2, 1L).otherwise(0L)).as("n_d2"),
        sum(when(col("d") === 3, 1L).otherwise(0L)).as("n_d3"),
        sum(expr("CAST(6 AS BIGINT) DIV d")).as("harmonic_x6"))
    seedRows.join(reach, Seq("seed"), "left")
      .selectExpr("seed", "seed_degree",
        "coalesce(n_d1, CAST(0 AS BIGINT)) AS n_d1",
        "coalesce(n_d2, CAST(0 AS BIGINT)) AS n_d2",
        "coalesce(n_d3, CAST(0 AS BIGINT)) AS n_d3",
        "coalesce(harmonic_x6, CAST(0 AS BIGINT)) AS harmonic_x6",
        """floor((CAST(coalesce(harmonic_x6, 0) AS DOUBLE)/6)*1e6
          | + 0.5)/1e6 AS harmonic""".stripMargin)
      .orderBy("seed")
  }

  private def harmonicCentrality(s: SparkSession, dir: String): DataFrame = {
    // Shared forward pass (GraphBfs.sharedLevels — parquet memo fed
    // to this row AND graph_betweenness_approx); the histogram tail
    // never touches the edge list at all.
    val (seedRows, levels) = GraphBfs.sharedLevels(s, dir, seeds = 3, k = 3)
    harmonicFrom(seedRows, levels)
  }

  private val harmonicOracle = {
    val rounds = (1 to 3).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT p.seed, p.node,
         |    least(coalesce(p.d, m.nd), coalesce(m.nd, p.d)) AS d
         |  FROM d${i - 1} p LEFT JOIN (
         |    SELECT q.seed, e.src AS node, min(q.d + 1) AS nd
         |    FROM e JOIN d${i - 1} q ON e.dst = q.node
         |    WHERE q.d IS NOT NULL
         |    GROUP BY 1, 2) m ON p.seed = m.seed AND p.node = m.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey),
       |deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS deg
       |        FROM e GROUP BY 1),
       |s AS MATERIALIZED (
       |  SELECT n AS seed, deg AS seed_degree FROM deg
       |  ORDER BY deg DESC, n LIMIT 3),
       |d0 AS MATERIALIZED (
       |  SELECT seed, node,
       |    CASE WHEN node = seed THEN CAST(0 AS BIGINT) END AS d
       |  FROM (SELECT DISTINCT src AS node FROM e) CROSS JOIN s),
       |$rounds,
       |r AS (
       |  SELECT seed,
       |    CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
       |    CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2,
       |    CAST(sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_d3,
       |    CAST(sum(CASE WHEN d >= 1 THEN 6 // d ELSE 0 END) AS BIGINT)
       |      AS harmonic_x6
       |  FROM d3 GROUP BY 1)
       |SELECT s.seed, s.seed_degree,
       |  coalesce(n_d1, CAST(0 AS BIGINT)) AS n_d1,
       |  coalesce(n_d2, CAST(0 AS BIGINT)) AS n_d2,
       |  coalesce(n_d3, CAST(0 AS BIGINT)) AS n_d3,
       |  coalesce(harmonic_x6, CAST(0 AS BIGINT)) AS harmonic_x6,
       |  floor((CAST(coalesce(harmonic_x6, 0) AS DOUBLE)/6)*1e6
       |   + 0.5)/1e6 AS harmonic
       |FROM s LEFT JOIN r USING (seed) ORDER BY seed""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_jaccard_linkpred" -> (jaccardLinkpred _),
    "graph_rich_club" -> (richClub _),
    "graph_harmonic_centrality" -> (harmonicCentrality _)
  )

  val oracle: Map[String, String] = Map(
    "graph_jaccard_linkpred" -> jaccardLinkpredOracle,
    "graph_rich_club" -> richClubOracle,
    "graph_harmonic_centrality" -> harmonicOracle
  )
}
