package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.46 (round-20 additions, VERDICT r10 item 7) — two
  * training-data-pipeline operators past the document granularity:
  *
  *  - [[spanNearDup]]: span-level (paragraph-surrogate) near-dup —
  *    `llm_dup_span_fraction` finds EXACT duplicated spans;
  *    this row finds NEAR-duplicated 16-token spans across documents
  *    via a per-span 1-lane MinHash block (min of the span's
  *    md5-derived bigram hashes) + exact in-block Jaccard verify with
  *    the production [[graft.functions.SortedJaccard]] kernel — the
  *    boilerplate/template-leak detector at sub-document resolution.
  *
  *  - [[domainMixOptimize]]: `llm_domain_mix` caps every domain at
  *    the min-count (throws data away in big domains); this row
  *    solves the cap as a WATER-FILLING allocation — the largest cap
  *    whose total allocation fits a 70% corpus budget — and keeps
  *    each stratum's TOP-quality docs under [[LlmOps2.qualityFull]]
  *    weights (quality-weighted mixing, the DoReMi/online-mixing
  *    preprocessing shape). All cap arithmetic is exact int64, so
  *    both engines derive the identical allocation.
  */
object LlmOps17 {

  /** Near-duplicated 16-token span pairs across documents.
    *
    * Scale shape: spans explode to one row per 16 tokens (corpus
    * token count / 16 — linear); the block key is ONE MinHash lane
    * (P[same key] = Jaccard for any pair, so a J >= 0.5 pair is
    * recalled with p = J; banding with more lanes raises recall at
    * the standard LSH cost — this row pins the 1-lane tier, and both
    * engines compute the identical deterministic result either way).
    * Pairs generate from a bare-key equi-join on the block key — the
    * bigram-set arrays are re-attached doc-keyed AFTER pairing and
    * the Jaccard verify is the codegen SortedJaccard merge walk, the
    * ngramDupPairs plan discipline. Never all-pairs.
    *
    * Hashes are 60-bit md5 prefixes (the llm_hash_features pattern),
    * so the DuckDB replica computes the IDENTICAL min-hash keys and
    * Jaccard values — unlike xxhash64, nothing here is
    * engine-specific. */
  private[graft] def spanNearDup(docs: DataFrame): DataFrame = {
    // Non-overlapping 16-token spans; only full chunks (a trailing
    // fragment compares apples-to-oranges against full spans). The
    // 15 in-span bigrams hash through md5 ONCE per span (the token
    // array is materialized before the transform — HOF lambdas are
    // interpreted, so split() must not inline into them).
    val spans = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 16)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(w) div 16 - 1), i -> slice(w, i * 16 + 1, 16))")))
      .toDF("doc_id", "span_idx", "sw")
      .select(col("doc_id"), col("span_idx").cast("long").as("span_idx"),
        // The fixed span width lets the 15 bigram hashes unroll into
        // 15 codegen'd expressions (array(...) of plain columns)
        // instead of a transform() lambda — HOF lambdas are
        // INTERPRETED, and 15 interpreted md5+conv evals per span
        // measurably dominate this operator's runtime.
        sort_array(array_distinct(array((0 until 15).map { j =>
          conv(substring(md5(concat_ws(" ",
            element_at(col("sw"), j + 1), element_at(col("sw"), j + 2))),
            1, 15), 16, 10).cast("long")
        }: _*))).as("bg"))
    // Block key = the span's min bigram hash (sorted array head).
    // Unlike document-granularity dedup (ngramDupPairs, where bigram
    // sets are unbounded and must be re-attached doc-keyed AFTER the
    // pair join), a span's set is FIXED at <= 15 longs (~120 B) — a
    // bounded per-row payload — so the sets ride the band self-join
    // directly: ONE exchange on minh instead of a pair join plus two
    // verify joins, and no checkpoint barrier. The right plan at any
    // scale BECAUSE the span width is a constant.
    // persist (not localCheckpoint): BOTH self-join sides read this
    // subtree and ReuseExchange does not reliably fire under AQE (the
    // Round27Spec finding), so without a materialization the
    // tokenize+md5 span build runs twice (measured 2x wall). persist
    // fills on the join's own broadcast build — no standalone
    // checkpoint job (builder-measured ~0.5 s saved vs checkpoint).
    // Known residual cost, measured and accepted: Catalyst pushes the
    // jaccard filter INTO the join condition ahead of the doc_a <
    // doc_b residual, so the kernel evaluates on both orientations of
    // each candidate pair (~2x the minimum; a monotonically-
    // increasing-id projection barrier does NOT stop the push —
    // deterministic aliases push through it).
    val banded = spans.select(col("doc_id"), col("span_idx"), col("bg"),
        element_at(col("bg"), 1).as("minh"))
      .persist()
    banded.as("a").join(banded.as("b"),
        col("a.minh") === col("b.minh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.span_idx").as("span_a"),
        col("b.doc_id").as("doc_b"), col("b.span_idx").as("span_b"),
        round(graft.functions.SortedJaccard(col("a.bg"), col("b.bg")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "span_a", "doc_b", "span_b")
  }

  /** Quality-weighted domain-mixing allocation (domain = lang — the
    * skewed stratification this corpus actually has; source strata
    * are uniform by construction).
    *
    * cap = the water-filling level: the largest per-domain cap whose
    * total allocation Σ min(n_d, cap) fits the 70% corpus budget.
    * Derived in closed form over the DOMAIN-COUNT relation (|domains|
    * rows — the unpartitioned windows are bounded by the domain
    * alphabet, not the corpus): sort domains by count ascending; at
    * the first index where (budget - smaller-domains-total) div
    * remaining-domains <= n_d, that quotient is the cap. Pure int64
    * arithmetic — both engines derive the identical cap.
    *
    * Within each domain the kept docs are the top-cap by
    * (quality DESC, doc_id) under THE llm_quality_score weights
    * ([[LlmOps2.qualityFull]] — single definition, bit-identical
    * doubles cross-engine). Mean kept quality accumulates EXACT
    * micro-units (the cents discipline) and divides once at
    * presentation. Scale: one corpus pass for quality, one
    * domain-keyed top-k window, broadcast-sized cap/count tables. */
  private[graft] def domainMixOptimize(docs: DataFrame): DataFrame = {
    val q = LlmOps2.qualityFull(docs).select("doc_id", "lang", "quality")
    // Counts read ONLY the lang column (column-pruned scan) — going
    // through q here would run the whole text-parsing quality pass a
    // second time just to count rows per stratum.
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).cast("long").as("n_total"),
      count(lit(1)).as("n_src"))
    val wAsc = Window.orderBy(col("n_docs").asc, col("lang").asc)
    val cand = counts
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("pfx", sum(col("n_docs"))
        .over(wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr("(7 * n_total) div 10"))
      .withColumn("cand",
        expr("(budget - (pfx - n_docs)) div (n_src - rn + 1)"))
    // First feasible index (cand <= n_docs) wins; if none, the budget
    // covers the whole corpus and the cap is the largest domain.
    val cap = cand.agg(
        min(when(col("cand") <= col("n_docs"),
          struct(col("rn"), col("cand")))).as("f"),
        max(col("n_docs")).as("mx"))
      .select(coalesce(col("f.cand"), col("mx")).as("cap"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(desc("quality"), asc("doc_id"))
    q.withColumn("qr", row_number().over(wTop))
      .crossJoin(broadcast(cap))
      .filter(col("qr") <= col("cap"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(floor(col("quality") * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("sum_q_micro"),
        sum(col("doc_id")).as("sum_kept_ids"))
      .join(broadcast(counts), "lang")
      .select(col("lang"), col("n_docs"), col("n_kept"),
        col("sum_q_micro"),
        (col("sum_q_micro").cast("double") / col("n_kept").cast("double")
          / lit(1000000.0)).as("mean_quality"),
        col("sum_kept_ids"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_span_neardup" -> ((s: SparkSession, dir: String) =>
      spanNearDup(load(s, dir, "documents"))),
    "llm_domain_mix_optimize" -> ((s: SparkSession, dir: String) =>
      domainMixOptimize(load(s, dir, "documents")))
  )

  // Shared quality-formula text (the llm_quality_score oracle's
  // composite), kept in ONE string so the two oracle replicas cannot
  // drift from each other.
  private val qualitySql =
    """floor(((CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)) * 0.5 +
      |  (1.0 - CAST(len(list_filter(w,
      |    t2 -> list_contains(['the', 'a', 'of', 'and'], t2))) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE)) * 0.3 +
      |  least(CAST(length(text) - (len(w) - 1) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE) / 10.0, 1.0) * 0.2
      |  ) * 1000000.0 + 0.5) / 1000000.0""".stripMargin

  val oracle: Map[String, String] = Map(
    // Identical pipeline: 16-token chunks -> 60-bit md5 bigram hash
    // sets -> min-hash block key -> cross-doc in-block pairs -> exact
    // Jaccard on the SAME hash values.
    "llm_span_neardup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(u.i AS BIGINT) AS span_idx,
        |    w[u.i * 16 + 1 : u.i * 16 + 16] AS sw
        |  FROM t, UNNEST(range(0, len(w) // 16)) AS u(i)
        |  WHERE len(w) >= 16),
        |g AS (SELECT doc_id, span_idx,
        |    list_sort(list_distinct(list_transform(range(1, 16),
        |      j -> CAST(concat('0x',
        |        substr(md5(sw[j] || ' ' || sw[j + 1]), 1, 15)) AS BIGINT))))
        |      AS bg
        |  FROM c),
        |k AS (SELECT doc_id, span_idx, bg, bg[1] AS minh FROM g),
        |p AS (SELECT a.doc_id AS doc_a, a.span_idx AS span_a,
        |    b.doc_id AS doc_b, b.span_idx AS span_b,
        |    CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.bg, b.bg))) AS DOUBLE) AS j
        |  FROM k a JOIN k b ON a.minh = b.minh AND a.doc_id < b.doc_id)
        |SELECT doc_a, span_a, doc_b, span_b, round(j, 6) AS jaccard
        |FROM p WHERE round(j, 6) >= 0.5
        |ORDER BY doc_a, span_a, doc_b, span_b""".stripMargin,

    "llm_domain_mix_optimize" ->
      s"""WITH m AS (
         |  SELECT doc_id, lang, $qualitySql AS quality
         |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS w
         |        FROM documents)),
         |counts AS (SELECT lang, count(*) AS n_docs FROM m GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
         |  count(*) AS n_src FROM counts),
         |rk AS (SELECT lang, n_docs,
         |    row_number() OVER (ORDER BY n_docs, lang) AS rn,
         |    sum(n_docs) OVER (ORDER BY n_docs, lang
         |      ROWS UNBOUNDED PRECEDING) AS pfx
         |  FROM counts),
         |cand AS (SELECT rk.*,
         |    ((7 * n_total) // 10 - (pfx - n_docs)) // (n_src - rn + 1) AS cand
         |  FROM rk CROSS JOIN tot),
         |cap AS (SELECT coalesce(
         |    (SELECT cand FROM cand WHERE cand <= n_docs ORDER BY rn LIMIT 1),
         |    (SELECT max(n_docs) FROM counts)) AS cap),
         |ranked AS (SELECT m.*, row_number() OVER (
         |    PARTITION BY lang ORDER BY quality DESC, doc_id) AS qr FROM m),
         |kept AS (SELECT r.lang, r.doc_id, r.quality
         |  FROM ranked r CROSS JOIN cap WHERE qr <= cap)
         |SELECT k.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(CAST(floor(quality * 1000000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS sum_q_micro,
         |  CAST(sum(CAST(floor(quality * 1000000.0 + 0.5) AS BIGINT))
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
         |    AS mean_quality,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
         |FROM kept k JOIN counts c USING (lang)
         |GROUP BY k.lang, c.n_docs ORDER BY lang""".stripMargin
  )
}
