package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.17 — retrieval-ranking and corpus-overlap operators:
  * BM25 scoring (the IR ranking the inverted index of
  * `llm_inverse_index` exists to serve), reciprocal-rank fusion of two
  * retrieval rankings (the standard hybrid-search combiner), and the
  * cross-document duplicated-span fraction (the Gopher/RefinedWeb
  * "fraction of text inside duplicated n-grams" corpus measure —
  * per-doc contamination BY the rest of the corpus, distinct from the
  * pairwise dedup family).
  *
  * Float determinism: every score is assembled from exact integer
  * counts in ONE pinned expression — the formula string is shared
  * verbatim between the Spark plan and the DuckDB oracle — and rounded
  * to 6 dp on both sides (the established `llm_tfidf` /
  * `llm_simsearch_*` rule, SURVEY §1.5).
  *
  * Scale notes:
  *  - bm25: one token explode → two hash aggregates keyed on doc_id
  *    (co-partitioned), document-frequency and corpus stats are
  *    single-row broadcasts, top-20 via TakeOrderedAndProject — the
  *    corpus is scanned twice and shuffled once at token width.
  *  - rrf: each ranking is a rounded-score TakeOrderedAndProject
  *    (top-100) — the corpus scan never materializes a global sort;
  *    RRF over truncated rankings is the textbook formulation.
  *  - dup_span: spans shuffle ONCE on the span hash (a window computes
  *    the distinct-doc count in place, instead of a groupBy + re-join
  *    that would shuffle the span table twice); the per-doc aggregate
  *    then hashes on doc_id. Span text is md5'd before the shuffle so
  *    exchange width is 32 bytes/span, not the raw 8-gram.
  */
object LlmOps5 {

  // ---- llm_bm25 -----------------------------------------------------
  // Okapi BM25 (k1 = 1.2, b = 0.75) for a fixed 3-term query.
  // Columns feeding the formula are all DOUBLE derived from exact
  // integer counts: tf_i, df_i, dl (per-doc token count), n_docs,
  // avgdl (exact long sum / count).
  private val bmTerms = Seq("spark", "vector", "window")

  private def bmTermFormula(i: Int): String =
    s"ln(1.0 + (n_docs - df$i + 0.5) / (df$i + 0.5)) * (tf$i * 2.2) / " +
      s"(tf$i + 1.2 * (0.25 + 0.75 * (dl / avgdl)))"

  private val bm25Formula =
    s"round(${(1 to 3).map(bmTermFormula).mkString(" + ")}, 6)"

  private def bm25(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
    val lens = d.select(col("doc_id"),
      size(split(col("text"), " ")).as("li"))
    val stats = lens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("li")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val toks = d.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
    val tfCols = bmTerms.zipWithIndex.map { case (t, i) =>
      count(when(col("w") === t, lit(1))).cast("double").as(s"tf${i + 1}")
    }
    val tf = toks.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val dfCols = bmTerms.zipWithIndex.map { case (t, i) =>
      countDistinct(when(col("w") === t, col("doc_id"))).cast("double")
        .as(s"df${i + 1}")
    }
    val dfreq = toks.agg(dfCols.head, dfCols.tail: _*)
    tf.join(lens, "doc_id")
      .withColumn("dl", col("li").cast("double"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfreq))
      .selectExpr("doc_id", s"$bm25Formula AS bm25")
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(20)
  }

  // ---- llm_rrf_fusion ----------------------------------------------
  // Reciprocal-rank fusion (k = 60) of two cosine rankings (query
  // vectors 0 and 1) truncated to their top-100: documents outside a
  // ranking contribute 0 from it. Ranks are ints derived from rounded
  // scores with a vec_id tiebreak, so the fusion is exact.
  // CAST(1.0 AS DOUBLE): a bare 1.0 literal parses as DECIMAL in both
  // SQL dialects, and ra/rb are ints — without the cast the whole
  // score would silently become decimal arithmetic.
  private val rrfFormula =
    "round(coalesce(CAST(1.0 AS DOUBLE) / (60.0 + ra), CAST(0.0 AS DOUBLE)) + " +
      "coalesce(CAST(1.0 AS DOUBLE) / (60.0 + rb), CAST(0.0 AS DOUBLE)), 6)"

  private def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val e = load(s, dir, "embeddings")
    val q = e.filter(col("vec_id").isin(0L, 1L)).agg(
      first(when(col("vec_id") === 0L, col("embedding")), ignoreNulls = true)
        .as("q0"),
      first(when(col("vec_id") === 1L, col("embedding")), ignoreNulls = true)
        .as("q1"))
    val sims = e.filter(!col("vec_id").isin(0L, 1L))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.CosineSim(col("embedding"), col("q0")), 6)
          .as("s0"),
        round(graft.functions.CosineSim(col("embedding"), col("q1")), 6)
          .as("s1"))
    def top(scoreCol: String, rankCol: String): DataFrame = {
      // TakeOrderedAndProject truncation, then a rank over the 100
      // survivors (the single-partition window is 100 rows by
      // construction — the corpus never sees a global sort).
      val w = Window.orderBy(desc(scoreCol), asc("vec_id"))
      sims.orderBy(desc(scoreCol), asc("vec_id")).limit(100)
        .withColumn(rankCol, row_number().over(w))
        .select(col("vec_id"), col(rankCol))
    }
    val r0 = top("s0", "ra")
    val r1 = top("s1", "rb").withColumnRenamed("vec_id", "vec_id_b")
    r0.join(r1, col("vec_id") === col("vec_id_b"), "full_outer")
      .select(coalesce(col("vec_id"), col("vec_id_b")).as("vec_id"),
        expr(rrfFormula).as("rrf"))
      .orderBy(desc("rrf"), asc("vec_id"))
      .limit(20)
  }

  // ---- llm_dup_span_fraction ---------------------------------------
  // Per document: the fraction of its 8-token spans (all positions)
  // whose text also occurs in at least one OTHER document. Top 20 by
  // fraction. Docs shorter than 8 tokens have no spans and drop out —
  // a corpus property, identical on both sides.
  private def dupSpanFraction(s: SparkSession, dir: String): DataFrame = {
    val spans = load(s, dir, "documents")
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 8), i -> md5(array_join(slice(t, i + 1, 8), ' ')))"
      )).as("h"))
    val byHash = Window.partitionBy("h")
    spans
      .withColumn("nd", size(collect_set(col("doc_id")).over(byHash)))
      .groupBy(col("doc_id"))
      .agg(
        round(sum(when(col("nd") >= 2, 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double"), 6).as("dup_frac"),
        count(lit(1)).as("n_spans"))
      .orderBy(desc("dup_frac"), asc("doc_id"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_bm25" -> (bm25 _),
    "llm_rrf_fusion" -> (rrfFusion _),
    "llm_dup_span_fraction" -> (dupSpanFraction _)
  )

  val oracle: Map[String, String] = Map(
    "llm_bm25" ->
      s"""WITH lens AS (SELECT doc_id, len(string_split(text, ' ')) AS li
         |  FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  CAST(sum(li) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM lens),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |tf AS (SELECT doc_id,
         |  CAST(count(*) FILTER (WHERE w = '${bmTerms(0)}') AS DOUBLE) AS tf1,
         |  CAST(count(*) FILTER (WHERE w = '${bmTerms(1)}') AS DOUBLE) AS tf2,
         |  CAST(count(*) FILTER (WHERE w = '${bmTerms(2)}') AS DOUBLE) AS tf3
         |  FROM toks GROUP BY doc_id),
         |dfq AS (SELECT
         |  CAST(count(DISTINCT CASE WHEN w = '${bmTerms(0)}' THEN doc_id END) AS DOUBLE) AS df1,
         |  CAST(count(DISTINCT CASE WHEN w = '${bmTerms(1)}' THEN doc_id END) AS DOUBLE) AS df2,
         |  CAST(count(DISTINCT CASE WHEN w = '${bmTerms(2)}' THEN doc_id END) AS DOUBLE) AS df3
         |  FROM toks)
         |SELECT doc_id, $bm25Formula AS bm25
         |FROM (SELECT tf.*, CAST(li AS DOUBLE) AS dl, n_docs, avgdl,
         |        df1, df2, df3
         |      FROM tf JOIN lens USING (doc_id)
         |      CROSS JOIN stats CROSS JOIN dfq)
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "llm_rrf_fusion" ->
      s"""WITH q AS (SELECT
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0) AS q0,
         |  (SELECT embedding FROM embeddings WHERE vec_id = 1) AS q1),
         |sims AS (SELECT vec_id,
         |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         |    CAST(q0 AS DOUBLE[])), 6) AS s0,
         |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         |    CAST(q1 AS DOUBLE[])), 6) AS s1
         |  FROM embeddings CROSS JOIN q WHERE vec_id NOT IN (0, 1)),
         |r0 AS (SELECT vec_id,
         |  CAST(row_number() OVER (ORDER BY s0 DESC, vec_id) AS INT) AS ra
         |  FROM sims ORDER BY s0 DESC, vec_id LIMIT 100),
         |r1 AS (SELECT vec_id,
         |  CAST(row_number() OVER (ORDER BY s1 DESC, vec_id) AS INT) AS rb
         |  FROM sims ORDER BY s1 DESC, vec_id LIMIT 100)
         |SELECT coalesce(r0.vec_id, r1.vec_id) AS vec_id,
         |  $rrfFormula AS rrf
         |FROM r0 FULL OUTER JOIN r1 ON r0.vec_id = r1.vec_id
         |ORDER BY rrf DESC, vec_id LIMIT 20""".stripMargin,

    "llm_dup_span_fraction" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |spans AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS h
        |  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
        |  WHERE len(t) >= 8),
        |sd AS (SELECT h, count(DISTINCT doc_id) AS nd FROM spans GROUP BY h)
        |SELECT doc_id,
        |  round(CAST(count(*) FILTER (WHERE nd >= 2) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS dup_frac,
        |  count(*) AS n_spans
        |FROM spans JOIN sd USING (h)
        |GROUP BY doc_id
        |ORDER BY dup_frac DESC, doc_id LIMIT 20""".stripMargin
  )
}
