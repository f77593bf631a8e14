package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.49 (round-22 batch) — the three gaps VERDICT r11
  * ranked as what a real user hits next:
  *
  *  - [[referentialIntegrity]]: orphan-FK audit across every edge of
  *    the star schema — the FIRST data-quality check a warehouse
  *    pipeline runs, and the one the existing single-table `dq_*`
  *    rows cannot answer ("which lineitem rows orphan their order?").
  *
  *  - [[shortestPathWeighted]]: weighted graph distances —
  *    `graph_shortest_path` counts hops; with co-purchase
  *    multiplicity as the edge weight the same K-round Bellman-Ford
  *    loop answers "how far in accumulated edge cost" (min(d + w)
  *    instead of min(d + 1)).
  *
  *  - [[ewmaBacktest]]: a forecasting backtest beyond seasonal-naive —
  *    one-step-ahead truncated-EWMA (α = ½) forecasts of daily event
  *    counts, scored as MAE / bias / naive-baseline MAE per type.
  *
  * Scale shapes: each RI edge is ONE fk-keyed shuffle join (parent
  * side deduped by an aggregate on the small side; AQE broadcasts the
  * dim parents) feeding a map-side-combining conditional count — the
  * 7 edges are independent union branches, embarrassingly parallel;
  * weighted shortest-path inherits the connected_components loop
  * discipline (node-sized distance table broadcast into the edge
  * scan, ONE node-keyed min exchange per round); the EWMA window
  * follows the agg_weighted_median rule — it reads the (type, day)
  * COUNT aggregate, never the raw event table, so the few-value
  * partition key sorts a relation bounded by |types|·|days|.
  *
  * Determinism: RI and distance outputs are exact integers. The EWMA
  * forecast is exact-integer by construction: α = ½ truncated at 16
  * lags gives weights 2^(16-j)/65535, so the forecast numerator is an
  * integer dot product and every error sum accumulates in BIGINT; the
  * three ratios assemble ONCE in double from identical formula text
  * with floor-form 6-dp rounding (§1.5).
  */
object Composite33 {

  // ---- dq_referential_integrity ---------------------------------------
  // One row per FK edge: child rowcount and orphan count (fk NOT NULL
  // with no parent). NULL fks are counted in n_child but are NOT
  // orphans — missing values are dq_constraint_check's business; this
  // audit is about dangling references. The parent key is deduped
  // before the join so a (hypothetically) non-unique parent PK can
  // never double-count child rows into the audit.
  private def riEdge(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk).as("fk"))
      .join(parent.select(col(pk).as("fk")).distinct()
        .withColumn("hit", lit(1)), Seq("fk"), "left")
      .agg(count(lit(1)).as("n_child"),
        // coalesce: sum over an EMPTY child is NULL, and the audit
        // must stay total for empty relations (0 rows, 0 orphans)
        coalesce(sum(when(col("fk").isNotNull && col("hit").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_orphans"))
      .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))

  /** The full star-schema audit as (edge, n_child, n_orphans) rows.
    * Factored over arbitrary (name, child, fk, parent, pk) edges for
    * the planted-orphan spec and the facade. */
  private[graft] def referentialIntegrityOn(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    edges.map { case (n, c, fk, p, pk) => riEdge(n, c, fk, p, pk) }
      .reduce(_.unionAll(_))
      .orderBy("edge")

  private def referentialIntegrity(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem"); val o = load(s, dir, "orders")
    val c = load(s, dir, "customer"); val n = load(s, dir, "nation")
    referentialIntegrityOn(Seq(
      ("customer->nation", c, "c_nationkey", n, "n_nationkey"),
      ("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
      ("lineitem->part", li, "l_partkey", load(s, dir, "part"), "p_partkey"),
      ("lineitem->supplier", li, "l_suppkey", load(s, dir, "supplier"), "s_suppkey"),
      ("nation->region", n, "n_regionkey", load(s, dir, "region"), "r_regionkey"),
      ("orders->customer", o, "o_custkey", c, "c_custkey"),
      ("supplier->nation", load(s, dir, "supplier"), "s_nationkey", n, "n_nationkey")))
  }

  private def riOracleEdge(name: String, child: String, fk: String,
      parent: String, pk: String): String =
    s"""SELECT '$name' AS edge, CAST(count(*) AS BIGINT) AS n_child,
       |  CAST(sum(CASE WHEN c.fk IS NOT NULL AND p.fk IS NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
       |FROM (SELECT $fk AS fk FROM $child) c
       |LEFT JOIN (SELECT DISTINCT $pk AS fk FROM $parent) p USING (fk)""".stripMargin

  private val referentialIntegrityOracle = Seq(
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
    .map((riOracleEdge _).tupled)
    .mkString("", "\nUNION ALL\n", "\nORDER BY edge")

  // ---- graph_shortest_path_weighted ------------------------------------
  // K=3 Bellman-Ford rounds with min(d + w) over the multiplicity-
  // weighted co-purchase graph: w(src, dst) = number of orders whose
  // baskets contain both parts. graph_shortest_path's loop discipline
  // unchanged — node-sized distance table size-gated-broadcast into
  // the edge scan, one node-keyed min exchange per round, persist-per-round +
  // final eager localCheckpoint (each round's broadcast collect
  // materializes the previous cache; the rounds buffer keeps K
  // tables alive until then — K-proportional memory, fine at K = 3).
  // Same engine-agnostic NULL-min: least(coalesce(d, nd),
  // coalesce(nd, d)).

  /** Symmetric weighted co-purchase edges (src, dst, w): the
    * coPurchaseHalfEdges pair generation WITHOUT its distinct — the
    * per-(order, pair) rows count straight into the multiplicity via
    * one map-side-combining aggregate, then the half edges mirror. */
  private[graft] def coPurchaseWeightedEdges(s: SparkSession, dir: String): DataFrame = {
    val half = coPurchaseWeightedHalf(s, dir)
    half.unionAll(half.select(col("dst").as("src"), col("src").as("dst"),
      col("w")))
  }

  /** Weighted half edges as the BASE DiskMemo view of the co-purchase
    * layer (r18): the groupBy(src, dst).count keys are exactly the
    * distinct unordered pairs, so [[Composite4.coPurchaseHalfEdges]]
    * is a 2-column projection of THIS view — one co-purchase
    * aggregation feeds both the weighted and unweighted graph (the
    * warehouse layered-view shape). Build timed as
    * `memo_copurchase_weighted`; the unweighted projection's write is
    * what `memo_copurchase_half` times on top of it. */
  private[graft] def coPurchaseWeightedHalf(s: SparkSession, dir: String): DataFrame =
    DiskMemo.table(s, dir, "copurchase_weighted")(
      Composite4.sharedOrderPsets(s, dir)
        .select(col("ps"), posexplode(col("ps")))
        .toDF("ps", "i", "src")
        .select(col("src"),
          explode(slice(col("ps"), col("i") + lit(2), size(col("ps"))))
            .as("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w")))

  /** K weighted Bellman-Ford rounds over a (src, dst, w) edge list;
    * `seed` marks distance-0 nodes. Returns the distance histogram
    * (unreached = -1). The node universe is src ∪ dst, so asymmetric
    * (directed) edge lists keep their sink-only nodes in the
    * histogram; relaxation itself follows edge direction. Factored
    * for the planted spec and the scalacheck law against brute
    * k-round relaxation. */
  private[graft] def shortestPathWeightedOn(edges: DataFrame,
      seed: Column => Column, k: Int): DataFrame = {
    // r19: sentinel-distance + zero-weight self-loop fusion (see
    // Composite31.shortestPathOn — identical algebra, non-negative
    // weights required and given: co-purchase multiplicities ≥ 1).
    // One join + one map-side-combining min per round; the per-round
    // unreached re-attach left-join is gone. The node universe is
    // src ∪ dst, so directed lists keep their sink-only nodes.
    val e = edges.select(col("src"), col("dst"), col("w"))
      .unionAll(edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
        .select(col("node").as("src"), col("node").as("dst"),
          lit(0L).as("w")))
      .localCheckpoint()
    // Node universe from the checkpointed table (every node appears
    // as src once self-loops are in) — NOT from filter(w = 0), which
    // would double-count nodes if a caller ever passed genuine
    // zero-weight edges.
    var dist = e.select(col("src").as("node")).distinct()
      .select(col("node"),
        when(seed(col("node")), lit(0L))
          .otherwise(lit(Composite31.Unreached)).as("d"))
      .persist()
    // Hints size-gated once on the round-invariant node count; over
    // the cap the joins run un-hinted (node-keyed shuffles) instead
    // of hard-failing at the broadcast limit (graft.util.Hints).
    val hint = graft.util.Hints.maybeBroadcast(dist.count())
    val rounds = scala.collection.mutable.ListBuffer(dist)
    for (_ <- 1 to k) {
      dist = e
        .join(hint(dist.select(col("node").as("dst"), col("d").as("pd"))),
          "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("pd") + col("w")).as("d"))
        .persist()
      rounds += dist
    }
    val finalDist = dist.localCheckpoint()
    rounds.foreach(_.unpersist(false))
    finalDist.groupBy(
        when(col("d") >= Composite31.Unreached, lit(-1L))
          .otherwise(col("d")).as("distance"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("distance")
  }

  private def shortestPathWeighted(s: SparkSession, dir: String): DataFrame =
    shortestPathWeightedOn(coPurchaseWeightedEdges(s, dir),
      n => n % 100 === 0, k = 3)

  private def shortestPathWeightedOracle: String = {
    val rounds = (1 to 3).map { i =>
      s"""d$i AS (
         |  SELECT p.node,
         |    least(coalesce(p.d, m.nd), coalesce(m.nd, p.d)) AS d
         |  FROM d${i - 1} p LEFT JOIN (
         |    SELECT e.src AS node, min(q.d + e.w) AS nd
         |    FROM e JOIN d${i - 1} q ON e.dst = q.node
         |    WHERE q.d IS NOT NULL
         |    GROUP BY e.src) m ON p.node = m.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT DISTINCT a.l_orderkey, a.l_partkey AS src, b.l_partkey AS dst
       |    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |    WHERE a.l_partkey <> b.l_partkey)
       |  GROUP BY src, dst),
       |d0 AS MATERIALIZED (
       |  SELECT src AS node,
       |    CASE WHEN src % 100 = 0 THEN CAST(0 AS BIGINT) END AS d
       |  FROM (SELECT DISTINCT src FROM e)),
       |$rounds
       |SELECT coalesce(d, CAST(-1 AS BIGINT)) AS distance,
       |  CAST(count(*) AS BIGINT) AS n_nodes
       |FROM d3 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- win_ewma_backtest -----------------------------------------------
  // One-step-ahead truncated-EWMA backtest of daily event counts per
  // type: the forecast for each observed day is the 16-lag
  // exponentially-weighted mean of the PRECEDING observed days
  // (α = ½ ⇒ weights 2^(16-j)/65535 for lag j — the normalized
  // truncated geometric series; gaps between observed days advance
  // the lag sequence, not the calendar). Scored as MAE, bias (mean
  // signed error — negative means over-forecast), and the lag-1
  // naive baseline's MAE over the SAME scored rows, so the skill
  // comparison is like-for-like. The first 16 observed days per type
  // have no full window and score nothing.
  private val EwmaLags = 16

  private[graft] def ewmaBacktestOn(events: DataFrame): DataFrame = {
    // Daily counts FIRST (agg_weighted_median's window rule: the
    // few-value partition key must sort the (type, day) aggregate,
    // never the raw event table).
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val lagCols = (1 to EwmaLags).map(j => lag(col("y"), j).over(w).as(s"l$j"))
    // err = y·65535 − Σ l_j·2^(16−j): an exact-integer residual (the
    // forecast numerator is an integer dot product; 65535 = Σ weights).
    val fcNum = (1 to EwmaLags).map(j =>
      col(s"l$j") * lit(1L << (EwmaLags - j))).reduce(_ + _)
    daily
      .select(col("event_type") +: col("y") +: lagCols: _*)
      .filter(col(s"l$EwmaLags").isNotNull)
      .select(col("event_type"),
        (col("y") * lit(65535L) - fcNum).as("err"),
        abs(col("y") - col("l1")).as("naive_err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("err"))).as("sa"),
        sum(col("err")).as("se"),
        sum(col("naive_err")).as("sn"))
      .selectExpr("event_type", "n AS n_forecasts",
        "floor((CAST(sa AS DOUBLE) / 65535 / n)*1e6 + 0.5)/1e6 AS mae",
        "floor((CAST(se AS DOUBLE) / 65535 / n)*1e6 + 0.5)/1e6 AS bias",
        "floor((CAST(sn AS DOUBLE) / n)*1e6 + 0.5)/1e6 AS naive_mae")
      .orderBy("event_type")
  }

  private def ewmaBacktest(s: SparkSession, dir: String): DataFrame =
    ewmaBacktestOn(loadEvents(s, dir))

  private def ewmaBacktestOracle: String = {
    val lagDefs = (1 to EwmaLags).map(j => s"lag(y, $j) OVER w AS l$j")
      .mkString(",\n    ")
    val fcNum = (1 to EwmaLags).map(j => s"l$j*${1L << (EwmaLags - j)}")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
       |  FROM events),
       |daily AS (
       |  SELECT event_type, d, CAST(count(*) AS BIGINT) AS y
       |  FROM e GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, y,
       |    $lagDefs
       |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
       |s AS (
       |  SELECT event_type,
       |    y*65535 - ($fcNum) AS err,
       |    abs(y - l1) AS naive_err
       |  FROM lagged WHERE l$EwmaLags IS NOT NULL),
       |a AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(abs(err)) AS BIGINT) AS sa,
       |    CAST(sum(err) AS BIGINT) AS se,
       |    CAST(sum(naive_err) AS BIGINT) AS sn
       |  FROM s GROUP BY 1)
       |SELECT event_type, n AS n_forecasts,
       |  floor((CAST(sa AS DOUBLE) / 65535 / n)*1e6 + 0.5)/1e6 AS mae,
       |  floor((CAST(se AS DOUBLE) / 65535 / n)*1e6 + 0.5)/1e6 AS bias,
       |  floor((CAST(sn AS DOUBLE) / n)*1e6 + 0.5)/1e6 AS naive_mae
       |FROM a ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_referential_integrity" -> (referentialIntegrity _),
    "graph_shortest_path_weighted" -> (shortestPathWeighted _),
    "win_ewma_backtest" -> (ewmaBacktest _)
  )

  val oracle: Map[String, String] = Map(
    "dq_referential_integrity" -> referentialIntegrityOracle,
    "graph_shortest_path_weighted" -> shortestPathWeightedOracle,
    "win_ewma_backtest" -> ewmaBacktestOracle
  )
}
