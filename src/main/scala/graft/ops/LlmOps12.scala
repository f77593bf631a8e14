package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.25 (continued) — round-14 corpus operators: T5-style
  * span corruption with hash-deterministic masking and a Heaps-law
  * vocabulary-growth fit over log-spaced corpus prefixes.
  *
  * Scale shapes: span masking is pure map work (the mask decision is
  * a per-position md5-prefix compare — the llm_sample_hash
  * reproducible-by-construction discipline, no RNG state). The Heaps
  * fit never runs a per-document cumulative window (which would be a
  * single-partition scan at corpus scale): growth is measured at 20
  * log-spaced doc-id cutoffs, so the heavy work is two hash
  * aggregates and the cumulation happens over a 20-row table.
  */
object LlmOps12 {

  // ---- llm_span_mask -----------------------------------------------
  // Mask ≈10% of token positions (md5(doc_id_pos) first byte ≤ 0x19,
  // 26/256) with the sentinel, per document. Deterministic across
  // engines and runs by construction; surfaced as the masked-text
  // checksum plus exact mask counts, which pins every masked
  // position without shipping the full text through the comparer.
  private def spanMask(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("bigint").as("n_tokens"),
        expr(
          """transform(sequence(0, size(t) - 1), i ->
            |  CASE WHEN substr(md5(concat(CAST(doc_id AS STRING), '_',
            |                               CAST(i AS STRING))), 1, 2) <= '19'
            |       THEN '<extra_id>'
            |       ELSE element_at(t, CAST(i + 1 AS INT)) END)""".stripMargin)
          .as("m"))
      .select(col("doc_id"), col("n_tokens"),
        expr("CAST(size(filter(m, x -> x = '<extra_id>')) AS BIGINT)")
          .as("n_masked"),
        md5(array_join(col("m"), " ")).as("mask_checksum"))
      .orderBy("doc_id")

  private val spanMaskOracle =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |m AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |    list_transform(range(0, len(t)), i ->
      |      CASE WHEN substr(md5(doc_id || '_' || i), 1, 2) <= '19'
      |           THEN '<extra_id>' ELSE t[i + 1] END) AS m
      |  FROM d)
      |SELECT doc_id, n_tokens,
      |  CAST(len(list_filter(m, x -> x = '<extra_id>')) AS BIGINT) AS n_masked,
      |  md5(array_to_string(m, ' ')) AS mask_checksum
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- llm_heaps_fit -----------------------------------------------
  // Heaps' law V(N) = k·N^β: vocabulary size against corpus token
  // count, measured at 20 log-spaced doc-id prefixes of the corpus
  // (ingestion order). Each word contributes to the first prefix
  // containing its first-appearance doc; each doc's tokens to the
  // first prefix containing it; both cumulate over the 20-row prefix
  // table. β and k come from the explicit least-squares sums over
  // (ln N, ln V) — the agg_regression discipline.
  private def heapsFit(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val bounds = broadcast(docs.agg(
      min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")))
    // cutoff_j = lo + (hi-lo)·j³/8000, j = 1..20 — cubic spacing gives
    // the log-like early density a Heaps fit needs while staying in
    // EXACT integer arithmetic (a pow()-based cut could differ by one
    // ulp between libm implementations and truncate to different ids)
    val cuts = bounds.select(explode(expr(
      """transform(sequence(1, 20), j ->
        |  lo + ((hi - lo) * CAST(j AS BIGINT) * CAST(j AS BIGINT) *
        |        CAST(j AS BIGINT)) div 8000)""".stripMargin)).as("cut"))
      .distinct()
    val firstSeen = docs
      .select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
    // per cutoff: V = words first seen at-or-before it, N = tokens in docs
    // at-or-before it. Both via a tiny broadcast theta-join on ≤20 rows.
    val v = firstSeen.join(broadcast(cuts), col("first_doc") <= col("cut"))
      .groupBy(col("cut")).agg(count(lit(1)).as("v"))
    val n = docs.select(col("doc_id"), size(col("t")).cast("bigint").as("toks"))
      .join(broadcast(cuts), col("doc_id") <= col("cut"))
      .groupBy(col("cut")).agg(sum(col("toks")).cast("bigint").as("n"))
    val pts = v.join(n, "cut")
      .select(log(col("n").cast("double")).as("x"),
        log(col("v").cast("double")).as("y"))
    pts.agg(count(lit(1)).as("n_points"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
      .selectExpr("n_points",
        """round((CAST(n_points AS DOUBLE) * sxy - sx * sy) /
          |      (CAST(n_points AS DOUBLE) * sx2 - sx * sx), 6) AS beta""".stripMargin,
        """round(exp((sy - ((CAST(n_points AS DOUBLE) * sxy - sx * sy) /
          |             (CAST(n_points AS DOUBLE) * sx2 - sx * sx)) * sx) /
          |       CAST(n_points AS DOUBLE)), 6) AS k""".stripMargin)
  }

  private val heapsFitOracle =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bounds AS (
      |  SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM docs),
      |cuts AS (
      |  SELECT DISTINCT lo + ((hi - lo) * j * j * j) // 8000 AS cut
      |  FROM bounds, (SELECT unnest(range(1, 21)) AS j)),
      |first_seen AS (
      |  SELECT w, min(doc_id) AS first_doc
      |  FROM (SELECT doc_id, unnest(t) AS w FROM docs) GROUP BY w),
      |v AS (
      |  SELECT cut, CAST(count(*) AS BIGINT) AS v
      |  FROM cuts JOIN first_seen ON first_doc <= cut GROUP BY cut),
      |n AS (
      |  SELECT cut, CAST(sum(len(t)) AS BIGINT) AS n
      |  FROM cuts JOIN docs ON doc_id <= cut GROUP BY cut),
      |pts AS (
      |  SELECT ln(CAST(n AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
      |  FROM v JOIN n USING (cut)),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_points,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sx2
      |  FROM pts)
      |SELECT n_points,
      |  round((CAST(n_points AS DOUBLE) * sxy - sx * sy) /
      |        (CAST(n_points AS DOUBLE) * sx2 - sx * sx), 6) AS beta,
      |  round(exp((sy - ((CAST(n_points AS DOUBLE) * sxy - sx * sy) /
      |               (CAST(n_points AS DOUBLE) * sx2 - sx * sx)) * sx) /
      |         CAST(n_points AS DOUBLE)), 6) AS k
      |FROM sums""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_span_mask" -> (spanMask _),
    "llm_heaps_fit" -> (heapsFit _)
  )

  val oracle: Map[String, String] = Map(
    "llm_span_mask" -> spanMaskOracle,
    "llm_heaps_fit" -> heapsFitOracle
  )
}
