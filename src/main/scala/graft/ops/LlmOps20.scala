package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.86 (round-16 batch 1) — graded retrieval evaluation:
  *
  *  - [[annNdcg]]: nDCG@10 of the IVF ANN path against the exact
  *    brute-force cosine ranking — the GRADED metric an ANN tuning
  *    decision actually reads (`llm_ivf_recall` is binary hit@k: it
  *    cannot distinguish "found the top-1 at position 1" from "found
  *    it at position 10"). Relevance of an IVF candidate = 11 − its
  *    EXACT rank (exact top-1 gains 10 … exact top-10 gains 1,
  *    outside the exact top-10 gains 0); DCG discounts position i by
  *    1/log2(i+1) with the ten discounts PINNED as double literals
  *    (neither engine evaluates a log — the Holm-critical
  *    discipline); nDCG divides by the ideal DCG assembled from the
  *    same literals in the same fixed order. Per-query rows plus the
  *    q_id = −1 summary row carrying the corpus means.
  *
  * Scale shape: the llm_ivf_recall plumbing — IVF candidates come
  * from cell equi-joins (never N²), the exact side is the
  * brute-force ground truth on the 1%-sample query set (the
  * evaluation harness shape: at 100 TB you grade a query SAMPLE, and
  * only the exact side scans the corpus per query). The gain pivot
  * is a fixed-width 10-column aggregate per query (the agg_anova_f
  * fixed-order assembly), so the DCG dot product is ONE expression
  * with a fixed summation order.
  *
  * Determinism: per-rank gains are exact BIGINTs; DCG = Σ gᵢ·wᵢ in
  * fixed left-assoc order over pinned literals ⇒ bit-identical
  * doubles on both engines; the summary means divide exact
  * micro-unit BIGINT sums (Σ floor(x·1e6 + 0.5)) by the query count
  * — one double division, no cross-engine summation-order hazard.
  */
object LlmOps20 {

  private val NdcgK = 10

  /** 1/log2(i+1), i = 1..10, pinned to 17 significant digits. The E0
    * exponent keeps both parsers in APPROXIMATE-numeric (DOUBLE)
    * land: a bare decimal literal parses as DECIMAL in Spark and
    * DuckDB, dragging the whole dot product into engine-specific
    * decimal precision/scale propagation instead of IEEE doubles. */
  private val Disc = IndexedSeq(
    "1.0E0", "0.6309297535714575E0", "0.5E0", "0.43067655807339306E0",
    "0.38685280723454163E0", "0.3562071871080222E0",
    "0.3333333333333333E0", "0.31546487678572877E0",
    "0.3010299956639812E0", "0.2890648263178879E0")

  private val dcgExpr = (1 to NdcgK)
    .map(i => s"coalesce(g$i, CAST(0 AS BIGINT))*${Disc(i - 1)}")
    .mkString("(", " + ", ")")

  private val idcgExpr = (1 to NdcgK)
    .map(i => s"${NdcgK + 1 - i}*${Disc(i - 1)}")
    .mkString("(", " + ", ")")

  private def annNdcg(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
    val ivf = LlmOps3.ivfTopK(emb, col("vec_id") % 100 === 0, k = NdcgK)
      .select(col("q_id"), col("vec_id"), col("rn"))
    val exact = LlmOps.simsearchKnnK(s, dir, NdcgK)
      .select(col("q_id"), col("vec_id"), col("rn").as("ern"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"))
    ndcgFrom(queries, ivf, exact)
  }

  /** Grading core over pre-built rankings (planted-ranking test
    * seam): queries = (q_id), ivf = (q_id, vec_id, rn),
    * exact = (q_id, vec_id, ern). */
  private[graft] def ndcgFrom(queries: DataFrame, ivf: DataFrame,
      exact: DataFrame): DataFrame = {
    val rels = ivf.join(exact, Seq("q_id", "vec_id"), "left")
      .select(col("q_id"), col("rn"),
        coalesce(lit(NdcgK + 1) - col("ern"), lit(0)).as("rel"))
    val gainCols = (1 to NdcgK).map(i =>
      sum(when(col("rn") === i, col("rel")).otherwise(0))
        .cast("long").as(s"g$i")) :+
      sum(when(col("rel") > 0, 1).otherwise(0)).cast("long").as("n_overlap")
    val gains = rels.groupBy(col("q_id")).agg(gainCols.head, gainCols.tail: _*)
    // Drive from the query set so a query whose probed cells held no
    // candidates still scores 0 (it must drag the mean down, not
    // vanish from it).
    val per = queries
      .join(gains, Seq("q_id"), "left")
      .selectExpr("q_id",
        "coalesce(n_overlap, CAST(0 AS BIGINT)) AS n_overlap",
        s"floor(($dcgExpr)*1e6 + 0.5)/1e6 AS dcg",
        s"floor(($dcgExpr/$idcgExpr)*1e6 + 0.5)/1e6 AS ndcg")
      .localCheckpoint() // two consumers: the rows + the summary
    val summary = per.groupBy()
      .agg(sum(col("n_overlap")).as("no"),
        sum(expr("CAST(floor(dcg*1e6 + 0.5) AS BIGINT)")).as("sdm"),
        sum(expr("CAST(floor(ndcg*1e6 + 0.5) AS BIGINT)")).as("snm"),
        count(lit(1)).as("nq"))
      .selectExpr("CAST(-1 AS BIGINT) AS q_id", "no AS n_overlap",
        "floor(CAST(sdm AS DOUBLE)/nq + 0.5)/1e6 AS dcg",
        "floor(CAST(snm AS DOUBLE)/nq + 0.5)/1e6 AS ndcg")
    per.unionAll(summary).orderBy("q_id")
  }

  /** The IVF replica CTEs are LlmOps3's SINGLE shared SQL text (the
    * ivfOracleCtes discipline); the exact side re-derives the
    * brute-force ranking at k = 10. */
  private val annNdcgOracle = {
    val gainDefs = (1 to NdcgK).map(i =>
      s"CAST(sum(CASE WHEN rn = $i THEN rel ELSE 0 END) AS BIGINT) AS g$i")
      .mkString(",\n    ")
    s"""WITH ${LlmOps3.ivfOracleBase},
       |${LlmOps3.ivfOracleProbe(2, "")},
       |ivf AS (SELECT q_id, vec_id, rn FROM ranked WHERE rn <= $NdcgK),
       |gq AS (SELECT vec_id AS q_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id % 100 = 0),
       |gc AS (SELECT q_id, vec_id,
       |  round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
       |    CAST(embedding AS DOUBLE[])), 6) AS cos_sim
       |  FROM gq JOIN embeddings ON q_id <> vec_id),
       |gr AS (SELECT q_id, vec_id, row_number() OVER (
       |  PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn FROM gc),
       |ex AS (SELECT q_id, vec_id, rn AS ern FROM gr WHERE rn <= $NdcgK),
       |rels AS (
       |  SELECT i.q_id, i.rn, coalesce(${NdcgK + 1} - e.ern, 0) AS rel
       |  FROM ivf i LEFT JOIN ex e
       |    ON i.q_id = e.q_id AND i.vec_id = e.vec_id),
       |g AS (
       |  SELECT q_id,
       |    $gainDefs,
       |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_overlap
       |  FROM rels GROUP BY q_id),
       |qs AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id % 100 = 0),
       |per AS (
       |  SELECT qs.q_id,
       |    coalesce(n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
       |    floor(($dcgExpr)*1e6 + 0.5)/1e6 AS dcg,
       |    floor(($dcgExpr/$idcgExpr)*1e6 + 0.5)/1e6 AS ndcg
       |  FROM qs LEFT JOIN g ON qs.q_id = g.q_id)
       |SELECT q_id, n_overlap, dcg, ndcg FROM per
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS q_id,
       |  CAST(sum(n_overlap) AS BIGINT) AS n_overlap,
       |  floor(CAST(sum(CAST(floor(dcg*1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |    / count(*) + 0.5)/1e6 AS dcg,
       |  floor(CAST(sum(CAST(floor(ndcg*1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |    / count(*) + 0.5)/1e6 AS ndcg
       |FROM per
       |ORDER BY q_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_ann_ndcg" -> (annNdcg _)
  )

  val oracle: Map[String, String] = Map(
    "llm_ann_ndcg" -> annNdcgOracle
  )
}
