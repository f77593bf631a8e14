package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.34 — round-15 seventh batch: clustering purity
  * against the label column, temporal distribution drift, and
  * expected-shortfall tail risk.
  *
  * Scale shapes: purity reuses the kmeans-seed broadcast assignment
  * (map-side argmax) and reduces to k×labels cells; drift is two
  * conditional aggregates over event types; CVaR runs over the
  * horizon-bounded daily aggregate with a 1-row percentile
  * broadcast.
  *
  * Determinism: cluster assignment uses round(cos, 6) DESC, cid ASC
  * (kmeans discipline); purity/drift shares are exact-count ratios;
  * daily revenue stays decimal-exact until the final statistics.
  */
object LlmOps15 {

  // ---- llm_cluster_purity ------------------------------------------
  // Purity of the IVF blocking clusters against the label column:
  // assign every vector to its nearest seed centroid (vec_id < 8 —
  // exactly llm_simsearch_ivf's blocking scheme), then per cluster
  // surface the majority label (ties → smallest label) and its
  // share. Low purity here is WHY llm_knn_classify sits at chance on
  // this corpus — the labels are synthetic; the metric pipeline is
  // the deliverable.
  private def clusterPurity(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(desc("cos"), asc("cid"))
    val assign = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("cid"),
        round(graft.functions.CosineSim(col("embedding"), col("cvec")), 6)
          .as("cos"))
      .withColumn("rn", row_number().over(aw))
      .filter(col("rn") === 1)
    val cells = assign.groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("c"))
    val pw = Window.partitionBy(col("cid"))
      .orderBy(col("c").desc, col("label").asc)
    cells
      .withColumn("pr", row_number().over(pw))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("cid"))))
      .filter(col("pr") === 1)
      .select(col("cid"), col("n").cast("bigint").as("n"),
        col("label").as("top_label"), col("c").as("n_top"),
        round(col("c").cast("double") / col("n").cast("double"), 6)
          .as("purity"))
      .orderBy("cid")
  }

  private val clusterPurityOracle =
    """WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cid, e AS cvec FROM emb WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, label, cid FROM (
      |    SELECT emb.vec_id, emb.label, cents.cid, row_number() OVER (
      |      PARTITION BY emb.vec_id
      |      ORDER BY round(list_cosine_similarity(emb.e, cents.cvec), 6)
      |        DESC, cents.cid) AS rn
      |    FROM emb CROSS JOIN cents) WHERE rn = 1),
      |cells AS (
      |  SELECT cid, label, CAST(count(*) AS BIGINT) AS c
      |  FROM assign GROUP BY cid, label),
      |top AS (
      |  SELECT cid, label, c, row_number() OVER (
      |      PARTITION BY cid ORDER BY c DESC, label) AS pr,
      |    CAST(sum(c) OVER (PARTITION BY cid) AS BIGINT) AS n
      |  FROM cells)
      |SELECT cid, n, label AS top_label, c AS n_top,
      |  round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS purity
      |FROM top WHERE pr = 1
      |ORDER BY cid""".stripMargin

  // ---- evt_distribution_drift --------------------------------------
  // Event-type mix drift between the first half of the horizon and
  // the rest (split at 2024-01-16, the llm_bloom_prefilter boundary):
  // per-type early/late shares and the share delta — the input-drift
  // monitor every production pipeline runs. Exact counts, one
  // conditional aggregate, 1-row broadcast totals.
  private def distributionDrift(s: SparkSession, dir: String): DataFrame = {
    val typed = loadEvents(s, dir)
      .select(col("event_type"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).as("early"))
    val cells = typed.groupBy(col("event_type"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("n_early"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("n_late"))
    val tot = broadcast(cells.agg(
      sum(col("n_early")).cast("double").as("te"),
      sum(col("n_late")).cast("double").as("tl")))
    cells.crossJoin(tot)
      .select(col("event_type"), col("n_early"), col("n_late"),
        round(col("n_early").cast("double") / col("te"), 6)
          .as("share_early"),
        round(col("n_late").cast("double") / col("tl"), 6).as("share_late"),
        round(col("n_late").cast("double") / col("tl") -
          col("n_early").cast("double") / col("te"), 6).as("d_share"))
      .orderBy("event_type")
  }

  private val distributionDriftOracle =
    """WITH cells AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
      |    CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
      |      THEN 0 ELSE 1 END) AS BIGINT) AS n_late
      |  FROM events GROUP BY event_type),
      |tot AS (
      |  SELECT CAST(sum(n_early) AS DOUBLE) AS te,
      |    CAST(sum(n_late) AS DOUBLE) AS tl FROM cells)
      |SELECT event_type, n_early, n_late,
      |  round(CAST(n_early AS DOUBLE) / te, 6) AS share_early,
      |  round(CAST(n_late AS DOUBLE) / tl, 6) AS share_late,
      |  round(CAST(n_late AS DOUBLE) / tl - CAST(n_early AS DOUBLE) / te, 6)
      |    AS d_share
      |FROM cells CROSS JOIN tot
      |ORDER BY event_type""".stripMargin

  // ---- agg_cvar ----------------------------------------------------
  // Expected shortfall (CVaR₀.₀₅) of daily revenue: the mean of the
  // worst-5% days, plus the VaR threshold and the single worst day —
  // the tail-risk complement to win_drawdown's path risk. Daily
  // revenue is decimal-exact; the 5th-percentile threshold
  // interpolates those exact values; the tail mean's double drift is
  // absorbed by 6-dp rounding.
  private def cvar(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(asD(sum(money(col("o_totalprice"))).cast("decimal(18,2)"))
        .as("rev"))
    val th = broadcast(daily.agg(
      expr("percentile(rev, 0.05)").as("var05")))
    val worst = Window.orderBy(col("rev").asc, col("d").asc)
    daily.crossJoin(th)
      .withColumn("wr", row_number().over(worst))
      .agg(count(lit(1)).as("n_days"),
        round(first(col("var05")), 6).as("var05"),
        round(avg(when(col("rev") <= col("var05"), col("rev"))), 6)
          .as("cvar05"),
        max(when(col("wr") === 1, col("d"))).as("worst_day"),
        round(max(when(col("wr") === 1, col("rev"))), 6).as("worst_rev"))
  }

  private val cvarOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(15,2)))
      |      AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE) AS rev
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
      |th AS (SELECT quantile_cont(rev, 0.05) AS var05 FROM daily),
      |w AS (
      |  SELECT d, rev, var05,
      |    row_number() OVER (ORDER BY rev, d) AS wr
      |  FROM daily CROSS JOIN th)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  round(any_value(var05), 6) AS var05,
      |  round(avg(CASE WHEN rev <= var05 THEN rev END), 6) AS cvar05,
      |  max(CASE WHEN wr = 1 THEN d END) AS worst_day,
      |  round(max(CASE WHEN wr = 1 THEN rev END), 6) AS worst_rev
      |FROM w""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_cluster_purity" -> (clusterPurity _),
    "evt_distribution_drift" -> (distributionDrift _),
    "agg_cvar" -> (cvar _)
  )

  val oracle: Map[String, String] = Map(
    "llm_cluster_purity" -> clusterPurityOracle,
    "evt_distribution_drift" -> distributionDriftOracle,
    "agg_cvar" -> cvarOracle
  )
}
