package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.33 — round-15 sixth batch: local clustering by degree
  * decile, leaderboard rank dynamics, template detection, and a
  * price/volume growth decomposition.
  *
  * Scale shapes: local clustering reuses the degree-ordered triangle
  * orientation (adjacency ≤ √(2E)) and adds one explode of the
  * 3T per-triangle corner rows; rank dynamics keep BOTH monthly
  * windows behind rank-filter limits (WindowGroupLimit-pushed — the
  * full ranking never sorts past the limit per month); template
  * detection is two dense_rank hash exchanges; the decomposition
  * joins the month aggregate on month−1.
  *
  * Determinism: triangle corner counts exact; ranks row_number with
  * (value DESC, key ASC) tie-breaks; money decimal-exact to the
  * final division.
  */
object Composite17 {

  // ---- graph_local_clustering --------------------------------------
  // Watts–Strogatz LOCAL clustering by degree decile: per-node
  // triangle counts from the oriented intersection (each triangle
  // (u, v, w) credits its three corners once), local cc_i =
  // 2·tri_i / (deg_i·(deg_i−1)), then a decile profile over
  // (deg, node)-ordered nodes. The 3T corner explosion is the only
  // addition over graph_triangle_count's plan.
  private def localClustering(s: SparkSession, dir: String): DataFrame = {
    // r18: the degree/oriented/adjacency core is read from the shared
    // TriCore DiskMemo parquet views (built once per JVM, timed as
    // memo_tri_adjacency) instead of being rebuilt + checkpointed per
    // invocation (the pre-r18 shape measured ~4 s at sf0.1 with the
    // checkpoints, ~9.4 s without). Parquet statistics let the planner
    // broadcast the node-sized sides when they fit — no manual gates.
    val deg = TriCore.sharedDeg(s, dir)
    val o = TriCore.sharedOriented(s, dir)
    val adj = TriCore.sharedAdj(s, dir)
    val corners = o
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")),
        Seq("v"), "left")
      .select(col("u"), col("v"), graft.functions.SortedIntersect(col("nu"),
        coalesce(col("nv"), expr("CAST(array() AS ARRAY<BIGINT>)"))).as("ws"))
      .select(explode(concat(array(col("u"), col("v")), col("ws"))).as("n"))
    val tri = corners.groupBy(col("n")).agg(count(lit(1)).as("t3"))
    // every corner row came from one oriented triangle edge: u and v
    // appear once per triangle THROUGH that edge, w once per closing
    // intersection — each triangle credits each of its 3 corners
    // exactly once, so t3 IS the per-node triangle count
    val withCc = deg.join(tri, "n")
      .select(col("n"), col("deg"), col("t3"))
    // r18 retrofit: the decile profile rode a bare node-sized ntile
    // window (one task holds every node at target scale); DistRank
    // .globalNtile is SQL-ntile-exact over the same (deg, n) total
    // order, so the oracle hash cannot move. INT cast preserves the
    // green schema (the oracle pins decile as INT).
    graft.util.DistRank
      .globalNtile(withCc, "decile10", 10, Seq(col("deg"), col("n")))
      .withColumn("decile", col("decile10").cast("int")).drop("decile10")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_nodes"),
        round(avg(col("deg").cast("double")), 6).as("mean_deg"),
        round(avg(col("t3").cast("double") * 2.0 /
          (col("deg") * (col("deg") - 1)).cast("double")), 6)
          .as("mean_local_cc"))
      .orderBy("decile")
  }

  private val localClusteringOracle =
    """WITH ps AS (
      |  SELECT l_orderkey, list(DISTINCT l_partkey) AS ps
      |  FROM lineitem GROUP BY l_orderkey),
      |e AS (
      |  SELECT DISTINCT a AS src, b AS dst
      |  FROM (SELECT unnest(ps) AS a, ps FROM ps), unnest(ps) AS t(b)
      |  WHERE a < b),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS deg
      |  FROM (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) g
      |  GROUP BY n),
      |o AS (
      |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.src < e.dst)
      |           THEN e.src ELSE e.dst END AS u,
      |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.src < e.dst)
      |           THEN e.dst ELSE e.src END AS v
      |  FROM e JOIN deg da ON da.n = e.src JOIN deg db ON db.n = e.dst),
      |adj AS (
      |  SELECT u, list_sort(list(v)) AS nbrs FROM o GROUP BY u),
      |corners AS (
      |  SELECT unnest(list_concat([o.u, o.v],
      |    list_intersect(au.nbrs, coalesce(av.nbrs, [])))) AS n
      |  FROM o
      |  JOIN adj au ON au.u = o.u
      |  LEFT JOIN adj av ON av.u = o.v),
      |tri AS (SELECT n, CAST(count(*) AS BIGINT) AS t3
      |        FROM corners GROUP BY n),
      |cc AS (
      |  SELECT deg.n, deg.deg, tri.t3,
      |    CAST(ntile(10) OVER (ORDER BY deg.deg, deg.n) AS INT) AS decile
      |  FROM deg JOIN tri ON deg.n = tri.n)
      |SELECT decile, CAST(count(*) AS BIGINT) AS n_nodes,
      |  round(avg(CAST(deg AS DOUBLE)), 6) AS mean_deg,
      |  round(avg(CAST(t3 AS DOUBLE) * 2.0 /
      |    CAST(deg * (deg - 1) AS DOUBLE)), 6) AS mean_local_cc
      |FROM cc GROUP BY decile ORDER BY decile""".stripMargin

  // ---- win_rank_change ---------------------------------------------
  // Month-over-month leaderboard dynamics: this month's top-20
  // customers by revenue, with their previous-month rank when it was
  // inside the top-100 (NULL otherwise — "unranked"). BOTH windows
  // sit behind rank-filter limits, so WindowGroupLimit prunes each
  // month's sort; the full customer ranking never materializes.
  private def rankChange(s: SparkSession, dir: String): DataFrame = {
    val monthly = load(s, dir, "orders")
      .groupBy(trunc(col("o_orderdate"), "month").as("m"),
        col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)").as("rev"))
    val w = Window.partitionBy(col("m"))
      .orderBy(col("rev").desc, col("o_custkey").asc)
    val ranked = monthly.withColumn("rk", row_number().over(w))
    val top20 = ranked.filter(col("rk") <= 20)
    val prev100 = ranked.filter(col("rk") <= 100)
      .select(add_months(col("m"), 1).as("m"), col("o_custkey"),
        col("rk").as("prev_rk"))
    top20.join(prev100, Seq("m", "o_custkey"), "left")
      .select(col("m"), col("o_custkey"), col("rk"), asD(col("rev")).as("rev"),
        col("prev_rk"),
        (col("prev_rk") - col("rk")).as("delta"))
      .orderBy("m", "rk")
  }

  private val rankChangeOracle =
    """WITH monthly AS (
      |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
      |    o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(18,2))
      |      AS rev
      |  FROM orders GROUP BY 1, 2),
      |ranked AS (
      |  SELECT m, o_custkey, rev, row_number() OVER (
      |    PARTITION BY m ORDER BY rev DESC, o_custkey) AS rk
      |  FROM monthly),
      |top20 AS (SELECT * FROM ranked WHERE rk <= 20),
      |prev AS (
      |  SELECT m + INTERVAL 1 MONTH AS m, o_custkey, rk AS prev_rk
      |  FROM ranked WHERE rk <= 100)
      |SELECT t.m, t.o_custkey, CAST(t.rk AS INT) AS rk,
      |  CAST(CAST(t.rev AS VARCHAR) AS DOUBLE) AS rev,
      |  CAST(p.prev_rk AS INT) AS prev_rk,
      |  CAST(p.prev_rk - t.rk AS INT) AS delta
      |FROM top20 t LEFT JOIN prev p
      |  ON CAST(t.m AS TIMESTAMP) = CAST(p.m AS TIMESTAMP)
      |  AND t.o_custkey = p.o_custkey
      |ORDER BY t.m, t.rk""".stripMargin

  // ---- llm_template_detect -----------------------------------------
  // Templated-document detection: a doc is "templated" when BOTH its
  // 30-word opening and its 30-word closing are shared with at least
  // one other document — the boilerplate-page signature (shared
  // greeting + shared footer). Two dense_rank hash exchanges (the
  // line-dedup discipline), combined per doc, surfaced per source.
  private def templateDetect(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 60)
      .select(col("doc_id"), col("source"),
        md5(expr("array_join(slice(t, 1, 30), ' ')")).as("ph"),
        md5(expr("array_join(slice(t, -30, 30), ' ')")).as("sh"))
    def dupFlag(df: DataFrame, h: String, flag: String): DataFrame = {
      val byH = Window.partitionBy(h).orderBy("doc_id")
      val byHAll = Window.partitionBy(h)
      df.withColumn("dr", dense_rank().over(byH))
        .withColumn(flag, max(col("dr")).over(byHAll) >= 2)
        .drop("dr")
    }
    dupFlag(dupFlag(d, "ph", "pdup"), "sh", "sdup")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pdup") && col("sdup"), 1L).otherwise(0L))
          .as("n_templated"),
        round(sum(when(col("pdup") && col("sdup"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double"), 6)
          .as("template_rate"))
      .orderBy("source")
  }

  private val templateDetectOracle =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string(list_slice(w, 1, 30), ' ')) AS ph,
      |    md5(array_to_string(list_slice(w, len(w) - 29, len(w)), ' '))
      |      AS sh
      |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 60),
      |pd AS (SELECT ph FROM d GROUP BY ph
      |       HAVING count(DISTINCT doc_id) >= 2),
      |sd AS (SELECT sh FROM d GROUP BY sh
      |       HAVING count(DISTINCT doc_id) >= 2)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN pd.ph IS NOT NULL AND sd.sh IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_templated,
      |  round(CAST(sum(CASE WHEN pd.ph IS NOT NULL AND sd.sh IS NOT NULL
      |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS template_rate
      |FROM d LEFT JOIN pd ON d.ph = pd.ph LEFT JOIN sd ON d.sh = sd.sh
      |GROUP BY source ORDER BY source""".stripMargin

  // ---- agg_growth_decompose ----------------------------------------
  // MoM revenue-growth decomposition into volume, price, and mix:
  // Δrev = Δn·p̄₋₁ + n₋₁·Δp̄ + Δn·Δp̄ (p̄ = average order value). The
  // month aggregate joins on month−1; revenue stays decimal-exact
  // until p̄'s division; the three effects reconstruct Δrev by
  // construction (asserted in the spec).
  private def growthDecompose(s: SparkSession, dir: String): DataFrame = {
    val monthly = load(s, dir, "orders")
      .groupBy(trunc(col("o_orderdate"), "month").as("m"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("o_totalprice"))).cast("decimal(18,2)").as("rev"))
    val prev = monthly.select(add_months(col("m"), 1).as("m"),
      col("n").as("pn"), col("rev").as("prev"))
    // No round(): Spark rounds the exact binary double via BigDecimal
    // HALF_UP while DuckDB multiplies by 1e6 and rounds — they can
    // disagree one ulp from a .5 boundary (bit us once, driver r5).
    // Identical double expression TREES on both sides are bit-exact
    // without any rounding: same decimal-exact inputs, same IEEE op
    // order.
    monthly.join(prev, "m")
      .select(col("m"), col("n"), col("pn"),
        (asD(col("rev")) - asD(col("prev"))).as("d_rev"),
        ((col("n") - col("pn")).cast("double") *
          (asD(col("prev")) / col("pn").cast("double")))
          .as("volume_effect"),
        (col("pn").cast("double") *
          (asD(col("rev")) / col("n").cast("double") -
            asD(col("prev")) / col("pn").cast("double")))
          .as("price_effect"),
        ((col("n") - col("pn")).cast("double") *
          (asD(col("rev")) / col("n").cast("double") -
            asD(col("prev")) / col("pn").cast("double")))
          .as("mix_effect"))
      .orderBy("m")
  }

  private val growthDecomposeOracle =
    """WITH monthly AS (
      |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(18,2))
      |      AS rev
      |  FROM orders GROUP BY 1),
      |j AS (
      |  SELECT a.m, a.n, b.n AS pn,
      |    CAST(CAST(a.rev AS VARCHAR) AS DOUBLE) AS rv,
      |    CAST(CAST(b.rev AS VARCHAR) AS DOUBLE) AS pv
      |  FROM monthly a JOIN monthly b ON a.m = b.m + INTERVAL 1 MONTH)
      |SELECT m, n, pn,
      |  rv - pv AS d_rev,
      |  CAST(n - pn AS DOUBLE) * (pv / CAST(pn AS DOUBLE))
      |    AS volume_effect,
      |  CAST(pn AS DOUBLE) *
      |    (rv / CAST(n AS DOUBLE) - pv / CAST(pn AS DOUBLE))
      |    AS price_effect,
      |  CAST(n - pn AS DOUBLE) *
      |    (rv / CAST(n AS DOUBLE) - pv / CAST(pn AS DOUBLE))
      |    AS mix_effect
      |FROM j ORDER BY m""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_local_clustering" -> (localClustering _),
    "win_rank_change" -> (rankChange _),
    "llm_template_detect" -> (templateDetect _),
    "agg_growth_decompose" -> (growthDecompose _)
  )

  val oracle: Map[String, String] = Map(
    "graph_local_clustering" -> localClusteringOracle,
    "win_rank_change" -> rankChangeOracle,
    "llm_template_detect" -> templateDetectOracle,
    "agg_growth_decompose" -> growthDecomposeOracle
  )
}
