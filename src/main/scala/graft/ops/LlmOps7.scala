package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.19 — round-8 training-data-pipeline operators: the
  * bookkeeping layer a corpus build runs between filtering and
  * training — deterministic shard assignment, the quality-filter
  * funnel report, per-language tokenizer-fertility stats, n-gram
  * novelty (what fraction of a doc first appears in the corpus with
  * it), and DSIR importance scoring (Xie et al. 2023,
  * arXiv:2302.03169: rank docs by how target-like their hashed
  * n-gram/unigram features are under a smoothed LM ratio).
  *
  * Scale shapes: sharding/fertility/funnel are single
  * map-side-combining aggregates over pure projections; novelty is
  * one shuffle on the n-gram hash (window min — no per-row set
  * materialization, the dup_span_fraction discipline) + a per-doc
  * agg; DSIR broadcasts the vocabulary-sized (Heaps-sublinear) word
  * stats and a 1-row constants table into the token stream — three
  * corpus scans (word table, constants, scoring), each a
  * map-side-combining aggregate, no shuffle of the token stream
  * itself beyond the word aggregates.
  *
  * Float determinism: novelty/funnel ratios divide exact integers;
  * DSIR's per-token ln-ratio terms are identical-input libm calls
  * whose per-doc avg drifts ~1e-13 against O(1) outputs — absorbed
  * by 6-dp surface rounding (the llm_lm_score argument). Shard ids
  * come from the md5-nibble formula, shared text with the oracle.
  */
object LlmOps7 {

  // ---- llm_shard_assign --------------------------------------------
  // Deterministic 16-way shard assignment: shard = first md5 nibble
  // of the salted doc id — a pure row property (the llm_sample_hash
  // discipline), so any engine, rerun, or partitioning lands every
  // doc on the same shard. Surfaces per-shard doc counts, char
  // volume, and a VARCHAR-routed id checksum proving the PARTITION
  // (not just the sizes) is reproducible. One map-side-combining
  // aggregate; the formula text is shared with the oracle.
  private val shardFormula =
    "CAST(instr('0123456789abcdef', " +
      "substring(md5('graft' || CAST(doc_id AS STRING)), 1, 1)) - 1 AS INT)"

  private def shardAssign(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(expr(shardFormula).as("shard"), col("doc_id"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("doc_id").cast("decimal(38,0)")).cast("string").as("id_checksum"))
      .orderBy("shard")

  private val shardOracle =
    s"""SELECT $shardFormula AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(CAST(sum(doc_id) AS DECIMAL(38,0)) AS VARCHAR) AS id_checksum
       |FROM documents
       |GROUP BY shard ORDER BY shard""".stripMargin

  // ---- llm_token_fertility -----------------------------------------
  // Per-language tokenizer-fertility proxies: chars per token and
  // tokens per doc under the corpus whitespace tokenization — the
  // first thing a tokenizer evaluation tabulates per language
  // (fertility differences decide vocabulary allocation). Exact
  // integer sums; the two divisions are single pinned double ops.
  private def tokenFertility(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).as("n_tok"),
        length(col("text")).as("n_chr"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chr")).as("n_chars"),
        round(sum(col("n_chr")).cast("double") /
          sum(col("n_tok")).cast("double"), 6).as("chars_per_token"),
        round(sum(col("n_tok")).cast("double") /
          count(lit(1)).cast("double"), 6).as("tokens_per_doc"))
      .orderBy("lang")

  private val fertilityOracle =
    """WITH d AS (
      |  SELECT lang, len(string_split(text, ' ')) AS n_tok,
      |    length(text) AS n_chr
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(sum(n_chr) AS BIGINT) AS n_chars,
      |  round(CAST(sum(n_chr) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE), 6)
      |    AS chars_per_token,
      |  round(CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS tokens_per_doc
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---- llm_filter_funnel -------------------------------------------
  // The quality-filter attrition report: four sequential gates
  // (length band, minimum tokens, distinct-token ratio, mean token
  // length — the Gopher/C4 filter family) with per-stage survivor
  // counts and keep rates. ONE corpus scan: all four cumulative
  // survivor counts aggregate in a single map-side-combining pass
  // (conditional sums over per-doc flags), then `stack` unpivots the
  // 1-row aggregate into the 4-stage report — the agg_corr_matrix
  // single-pass discipline (a per-stage UNION would re-scan the
  // corpus per gate). Gate ratios divide exact integers, so the
  // boundary compares are engine-stable.
  private def filterFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
      .select(col("n_chars"),
        size(split(col("text"), " ")).as("n_tok"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " ")).cast("double")).as("dr"),
        ((length(col("text")).cast("double") -
          (size(split(col("text"), " ")) - 1).cast("double")) /
          size(split(col("text"), " ")).cast("double")).as("mtl"))
    val g = d.agg(
      count(lit(1)).as("c0"),
      sum(when(col("n_chars").between(100, 500), 1).otherwise(0)).as("c1"),
      sum(when(col("n_chars").between(100, 500) &&
        col("n_tok") >= 25, 1).otherwise(0)).as("c2"),
      sum(when(col("n_chars").between(100, 500) && col("n_tok") >= 25 &&
        col("dr") >= 0.35, 1).otherwise(0)).as("c3"),
      sum(when(col("n_chars").between(100, 500) && col("n_tok") >= 25 &&
        col("dr") >= 0.35 && col("mtl") <= 5.0, 1).otherwise(0)).as("c4"))
    g.selectExpr(
      """stack(4,
        |  1, 'len_100_500',       c0, c1,
        |  2, 'min_25_tokens',     c1, c2,
        |  3, 'distinct_ratio_35', c2, c3,
        |  4, 'mean_tok_len_5',    c3, c4) AS (stage, gate, n_in, n_out)""".stripMargin)
      .select(col("stage").cast("int").as("stage"), col("gate"),
        col("n_in").cast("bigint").as("n_in"),
        col("n_out").cast("bigint").as("n_out"),
        round(col("n_out").cast("double") / col("n_in").cast("double"), 6)
          .as("keep_rate"))
      .orderBy("stage")
  }

  private val funnelOracle =
    """WITH d AS (
      |  SELECT n_chars, len(string_split(text, ' ')) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS dr,
      |    (CAST(length(text) AS DOUBLE) -
      |      CAST(len(string_split(text, ' ')) - 1 AS DOUBLE)) /
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS mtl
      |  FROM documents),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS c0,
      |    CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 AND n_tok >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 AND n_tok >= 25 AND dr >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(sum(CASE WHEN n_chars BETWEEN 100 AND 500 AND n_tok >= 25 AND dr >= 0.35 AND mtl <= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS c4
      |  FROM d)
      |SELECT stage, gate, n_in, n_out,
      |  round(CAST(n_out AS DOUBLE) / CAST(n_in AS DOUBLE), 6) AS keep_rate
      |FROM (
      |  SELECT CAST(1 AS INT) AS stage, 'len_100_500' AS gate, c0 AS n_in, c1 AS n_out FROM g
      |  UNION ALL
      |  SELECT CAST(2 AS INT), 'min_25_tokens', c1, c2 FROM g
      |  UNION ALL
      |  SELECT CAST(3 AS INT), 'distinct_ratio_35', c2, c3 FROM g
      |  UNION ALL
      |  SELECT CAST(4 AS INT), 'mean_tok_len_5', c3, c4 FROM g)
      |ORDER BY stage""".stripMargin

  // ---- llm_ngram_novelty -------------------------------------------
  /** Per document: the fraction of its 3-token spans whose FIRST
    * corpus appearance (min doc_id over the span hash) is this
    * document — the novelty/derivativeness curve used to audit
    * corpus growth (a crawl snapshot whose new docs have near-zero
    * novelty is re-crawling what it already has). One shuffle on the
    * span md5; the first-appearance doc is a plain window min
    * (sort-free frame, no per-row set materialization), then a
    * per-doc hash aggregate. The [[graft.Graft.ngramNovelty]]
    * facade surface. */
  private[graft] def ngramNovelties(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"ngramNovelties: span width $n must be >= 2")
    val grams = docs
      .withColumn("t", split(col(textCol), " "))
      .filter(size(col("t")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(t) - $n, 1), i -> md5(array_join(slice(t, i + 1, $n), ' ')))"
      )).as("h"))
    grams
      .withColumn("mn", min(col(idCol)).over(Window.partitionBy("h")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        round(sum(when(col("mn") === col(idCol), 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double"), 6).as("novelty"))
  }

  private def ngramNovelty(s: SparkSession, dir: String): DataFrame =
    ngramNovelties(load(s, dir, "documents"), "doc_id", "text", n = 3)
      .orderBy("doc_id")

  private val noveltyOracle =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |x AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + 2), ' ')) AS h
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      |        FROM s WHERE len(t) >= 3)),
      |m AS (SELECT h, min(doc_id) AS mn FROM x GROUP BY h)
      |SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
      |  round(CAST(sum(CASE WHEN m.mn = x.doc_id THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE), 6) AS novelty
      |FROM x JOIN m USING (h)
      |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin

  // ---- llm_dsir_score ----------------------------------------------
  // DSIR importance scores (Xie et al. 2023, arXiv:2302.03169):
  // per-token mean log-ratio of a Laplace-smoothed target unigram LM
  // (target = the English slice, standing in for "high-quality
  // domain") against the whole-corpus LM — the hashed-n-gram importance
  // weight that DSIR samples by. Top-20 most target-like docs.
  // Smoothing term text is shared with the oracle; the per-doc mean
  // is avg+6-dp (the llm_lm_score determinism argument).
  private val dsirTerm =
    "ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + CAST(v AS DOUBLE))) - " +
      "ln((CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + CAST(v AS DOUBLE)))"

  /** Generic DSIR scoring core over (id, text) given a target-slice
    * predicate column — the [[graft.Graft.dsirScores]] facade
    * surface. Returns every doc with its mean per-token smoothed
    * log-ratio (NOT truncated; the declared query layers top-k). */
  private[graft] def dsirScoresOn(docs: DataFrame, idCol: String,
      textCol: String, isTarget: org.apache.spark.sql.Column): DataFrame = {
    val tok = docs.select(col(idCol), isTarget.as("tgt"),
      explode(split(col(textCol), " ")).as("w"))
    // both LMs' counts in ONE vocabulary aggregate (a separate
    // target-slice aggregate + left join would re-scan the corpus),
    // and the three normalizing constants straight off the token
    // stream (na = Σca, nt = Σct, v = │vocab│ — same values, one scan
    // instead of re-building the word table under the 1-row agg):
    // 3 corpus scans total, each a map-side-combining aggregate.
    val ws = tok.groupBy("w").agg(count(lit(1)).as("ca"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val consts = tok.agg(count(lit(1)).as("na"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("nt"),
      countDistinct(col("w")).as("v"))
    tok.join(broadcast(ws), "w")
      .crossJoin(broadcast(consts))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(expr(dsirTerm)), 6).as("dsir_score"))
  }

  private def dsirScore(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    dsirScoresOn(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("dsir_score"))
      .orderBy(desc("dsir_score"), asc("doc_id"))
      .limit(20)
  }

  private val dsirOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |awc AS (SELECT w, count(*) AS ca FROM tok GROUP BY w),
       |twc AS (SELECT w, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY w),
       |ws AS (
       |  SELECT w, ca, coalesce(ct, 0) AS ct
       |  FROM awc LEFT JOIN twc USING (w)),
       |c AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(ct) AS BIGINT) AS nt,
       |    count(*) AS v
       |  FROM ws)
       |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
       |  round(avg($dsirTerm), 6) AS dsir_score
       |FROM tok JOIN ws USING (w) CROSS JOIN c
       |GROUP BY doc_id, lang
       |ORDER BY dsir_score DESC, doc_id
       |LIMIT 20""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_shard_assign" -> (shardAssign _),
    "llm_token_fertility" -> (tokenFertility _),
    "llm_filter_funnel" -> (filterFunnel _),
    "llm_ngram_novelty" -> (ngramNovelty _),
    "llm_dsir_score" -> (dsirScore _)
  )

  val oracle: Map[String, String] = Map(
    "llm_shard_assign" -> shardOracle,
    "llm_token_fertility" -> fertilityOracle,
    "llm_filter_funnel" -> funnelOracle,
    "llm_ngram_novelty" -> noveltyOracle,
    "llm_dsir_score" -> dsirOracle
  )
}
