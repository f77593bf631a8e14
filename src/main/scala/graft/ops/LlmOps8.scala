package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.20 (continued) — round-9 corpus-analysis operators:
  * top-k vocabulary coverage (the truncation curve a tokenizer
  * vocabulary size is chosen from), PMI collocation mining (the
  * classic co-occurrence statistic), and the cross-source n-gram
  * contamination matrix (which sources are re-crawls of each other).
  *
  * Scale shapes: coverage and PMI aggregate the token stream into
  * vocabulary-sized tables (Heaps-sublinear) that broadcast back;
  * the one global rank window in coverage runs over that vocabulary
  * aggregate, never the token stream. The source-overlap self-join
  * is keyed on the shingle hash with per-key fan-out bounded by the
  * source count (≤20 here, |sources| generally) — never all-pairs
  * over documents.
  *
  * Float determinism: every ratio divides exact integers; PMI's ln
  * of an exact-integer ratio is an identical-input libm call whose
  * 1-ulp drift is absorbed by 6-dp rounding (the llm_lm_score
  * argument — relied on by agg_benford/llm_dsir_score already).
  */
object LlmOps8 {

  // ---- llm_vocab_coverage ------------------------------------------
  // Corpus coverage of the top-k most frequent tokens, k ∈ {10, 100,
  // 1000, 10000} — the curve a tokenizer vocabulary size is read
  // from. One token-stream aggregate to vocabulary size, a global
  // row_number over that (count desc, token asc — total order) on
  // the Heaps-sublinear word table, then ONE conditional-sum pass
  // unpivoted by `stack` (the llm_filter_funnel discipline).
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val words = load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("w"))))
    val g = words.agg(
      sum(col("c")).as("n_total"),
      sum(when(col("rk") <= 10, col("c")).otherwise(0L)).as("k10"),
      sum(when(col("rk") <= 100, col("c")).otherwise(0L)).as("k100"),
      sum(when(col("rk") <= 1000, col("c")).otherwise(0L)).as("k1000"),
      sum(when(col("rk") <= 10000, col("c")).otherwise(0L)).as("k10000"))
    g.selectExpr(
      """stack(4,
        |  10,    k10,    n_total,
        |  100,   k100,   n_total,
        |  1000,  k1000,  n_total,
        |  10000, k10000, n_total) AS (k, n_covered, n_total)""".stripMargin)
      .select(col("k").cast("int").as("k"),
        col("n_covered").cast("bigint").as("n_covered"),
        col("n_total").cast("bigint").as("n_total"),
        round(col("n_covered").cast("double") / col("n_total").cast("double"), 6)
          .as("coverage"))
      .orderBy("k")
  }

  private val coverageOracle =
    """WITH wc AS (
      |  SELECT w, count(*) AS c
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY w),
      |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM wc),
      |g AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n_total,
      |    CAST(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS BIGINT) AS k10,
      |    CAST(sum(CASE WHEN rk <= 100 THEN c ELSE 0 END) AS BIGINT) AS k100,
      |    CAST(sum(CASE WHEN rk <= 1000 THEN c ELSE 0 END) AS BIGINT) AS k1000,
      |    CAST(sum(CASE WHEN rk <= 10000 THEN c ELSE 0 END) AS BIGINT) AS k10000
      |  FROM r)
      |SELECT k, n_covered, n_total,
      |  round(CAST(n_covered AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS coverage
      |FROM (
      |  SELECT CAST(10 AS INT) AS k, k10 AS n_covered, n_total FROM g
      |  UNION ALL SELECT CAST(100 AS INT), k100, n_total FROM g
      |  UNION ALL SELECT CAST(1000 AS INT), k1000, n_total FROM g
      |  UNION ALL SELECT CAST(10000 AS INT), k10000, n_total FROM g)
      |ORDER BY k""".stripMargin

  // ---- llm_word_pmi ------------------------------------------------
  // Pointwise mutual information of adjacent token pairs (min count
  // 5), top-20 — the classic collocation statistic:
  // pmi = ln((c_xy/N_bi) / ((c_x/N_uni)·(c_y/N_uni))). Unigram and
  // bigram tables are vocabulary-sized and broadcast; the constants
  // fold in as a 1-row crossJoin. The shared formula text keeps both
  // engines on byte-identical arithmetic; ordering is by the ROUNDED
  // score (then the pair), so the 6-dp surface is also the sort key
  // — no unrounded-tie hazard.
  private val pmiTerm =
    "ln((CAST(cxy AS DOUBLE) / CAST(nb AS DOUBLE)) / " +
      "((CAST(cx AS DOUBLE) / CAST(nu AS DOUBLE)) * " +
      "(CAST(cy AS DOUBLE) / CAST(nu AS DOUBLE))))"

  private def wordPmi(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cx"))
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2, 1), " +
          "i -> struct(t[i] AS w1, t[i + 1] AS w2))")).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
    val consts = broadcast(uni.agg(sum(col("cx")).as("nu")).crossJoin(
      toks.select((size(col("t")) - 1).as("nb1"))
        .agg(sum(col("nb1")).as("nb"))))
    bi.join(broadcast(uni), col("w1") === col("w"))
      .drop("w")
      .join(broadcast(uni.withColumnRenamed("cx", "cy")), col("w2") === col("w"))
      .drop("w")
      .crossJoin(consts)
      .select(col("w1"), col("w2"), col("cxy"),
        round(expr(pmiTerm), 6).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(20)
  }

  private val pmiOracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |uni AS (
       |  SELECT w, count(*) AS cx
       |  FROM (SELECT unnest(t) AS w FROM t) GROUP BY w),
       |bi AS (
       |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2,
       |    count(*) AS cxy
       |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM t WHERE len(t) >= 2)
       |  GROUP BY w1, w2
       |  HAVING count(*) >= 5),
       |c AS (
       |  SELECT CAST(sum(cx) AS BIGINT) AS nu,
       |    (SELECT CAST(sum(len(t) - 1) AS BIGINT) FROM t) AS nb
       |  FROM uni)
       |SELECT w1, w2, CAST(cxy AS BIGINT) AS cxy, round($pmiTerm, 6) AS pmi
       |FROM bi
       |JOIN uni u1 ON bi.w1 = u1.w
       |JOIN (SELECT w, cx AS cy FROM uni) u2 ON bi.w2 = u2.w
       |CROSS JOIN c
       |ORDER BY pmi DESC, w1, w2
       |LIMIT 20""".stripMargin

  // ---- llm_source_overlap ------------------------------------------
  // Cross-source contamination matrix: 3-token-shingle Jaccard
  // between every source pair — the audit that finds which crawl
  // sources are re-serving each other's content. Distinct
  // (source, shingle-hash) pairs shuffle ONCE on the hash; the
  // candidate join is keyed on the hash with per-key fan-out bounded
  // by |sources| (the llm_dedup_ngram blocking discipline — never
  // all-pairs over documents); per-source distinct counts broadcast
  // into the final |sources|² matrix, completed with zero rows by a
  // tiny source×source cross join.
  private def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val grams = load(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(t) - 3, 1), " +
          "i -> md5(array_join(slice(t, i + 1, 3), ' ')))")).as("h"))
      .distinct()
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = grams.as("a").join(grams.as("b"), Seq("h"))
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    val pairs = sizes.select(col("source").as("src_a"), col("n").as("na"))
      .crossJoin(sizes.select(col("source").as("src_b"), col("n").as("nb")))
      .filter(col("src_a") < col("src_b"))
    pairs.join(broadcast(inter), Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))
            .cast("double"), 6).as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  private val overlapOracle =
    """WITH g AS (
      |  SELECT DISTINCT source,
      |    md5(array_to_string(
      |      list_slice(t, CAST(i AS INT), CAST(i AS INT) + 2), ' ')) AS h
      |  FROM (SELECT source, t, unnest(range(1, len(t) - 1)) AS i
      |        FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
      |        WHERE len(t) >= 3)),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(count(*) AS BIGINT) AS n_inter
      |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT p.src_a, p.src_b,
      |  coalesce(n_inter, 0) AS n_inter,
      |  round(CAST(coalesce(n_inter, 0) AS DOUBLE) /
      |    CAST(p.na + p.nb - coalesce(n_inter, 0) AS DOUBLE), 6) AS jaccard
      |FROM (
      |  SELECT a.source AS src_a, b.source AS src_b, a.n AS na, b.n AS nb
      |  FROM sz a CROSS JOIN sz b WHERE a.source < b.source) p
      |LEFT JOIN inter ON p.src_a = inter.src_a AND p.src_b = inter.src_b
      |ORDER BY p.src_a, p.src_b""".stripMargin

  // ---- llm_bigram_cond_entropy -------------------------------------
  // Corpus bigram conditional entropy H(W₂|W₁) — the predictability
  // number a tokenization/perplexity budget is sanity-checked
  // against — via the exact-count identity
  //   H = (Σ_x c_x·ln c_x − Σ_xy c_xy·ln c_xy) / N
  // (c_x = left-margin count Σ_y c_xy, N = total bigrams). One
  // token-stream aggregate to the bigram table, a map-side re-agg to
  // the margin, then two scalar Σc·ln c sums — the llm_token_entropy
  // discipline: ln terms are identical-input libm calls and the
  // parallel-sum accumulation drift (~1e-13 relative) is absorbed by
  // 6-dp rounding.
  private def bigramCondEntropy(s: SparkSession, dir: String): DataFrame = {
    val bi = load(s, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2, 1), " +
          "i -> struct(t[i] AS w1, t[i + 1] AS w2))")).as("p"))
      .groupBy(col("p.w1"), col("p.w2")).agg(count(lit(1)).as("cxy"))
    val joint = bi.agg(
      sum(col("cxy")).as("n"),
      count(lit(1)).as("n_pairs"),
      sum(col("cxy").cast("double") * log(col("cxy").cast("double"))).as("sj"))
    val margin = bi.groupBy(col("w1")).agg(sum(col("cxy")).as("cx"))
      .agg(count(lit(1)).as("n_w1"),
        sum(col("cx").cast("double") * log(col("cx").cast("double"))).as("sm"))
    joint.crossJoin(margin)
      .select(col("n").cast("bigint").as("n_bigrams"),
        col("n_pairs").cast("bigint").as("n_pairs"),
        col("n_w1").cast("bigint").as("n_w1"),
        round((col("sm") - col("sj")) / col("n").cast("double"), 6)
          .as("cond_entropy"))
  }

  private val condEntropyOracle =
    """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2,
      |    count(*) AS cxy
      |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM t WHERE len(t) >= 2)
      |  GROUP BY w1, w2),
      |j AS (
      |  SELECT CAST(sum(cxy) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS n_pairs,
      |    sum(CAST(cxy AS DOUBLE) * ln(CAST(cxy AS DOUBLE))) AS sj
      |  FROM bi),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_w1,
      |    sum(CAST(cx AS DOUBLE) * ln(CAST(cx AS DOUBLE))) AS sm
      |  FROM (SELECT w1, sum(cxy) AS cx FROM bi GROUP BY w1))
      |SELECT n AS n_bigrams, n_pairs, n_w1,
      |  round((sm - sj) / CAST(n AS DOUBLE), 6) AS cond_entropy
      |FROM j CROSS JOIN m""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_vocab_coverage" -> (vocabCoverage _),
    "llm_word_pmi" -> (wordPmi _),
    "llm_source_overlap" -> (sourceOverlap _),
    "llm_bigram_cond_entropy" -> (bigramCondEntropy _)
  )

  val oracle: Map[String, String] = Map(
    "llm_vocab_coverage" -> coverageOracle,
    "llm_word_pmi" -> pmiOracle,
    "llm_source_overlap" -> overlapOracle,
    "llm_bigram_cond_entropy" -> condEntropyOracle
  )
}
