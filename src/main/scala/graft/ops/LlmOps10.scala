package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.23 (continued) — round-12 asymmetric-duplication
  * operators: shingle CONTAINMENT (catches a doc swallowed whole by
  * a larger one, which symmetric Jaccard under-scores) and prefix
  * duplication (template intros — the boilerplate class where only
  * document HEADS repeat).
  *
  * Scale shapes: containment candidates come from a rare-shingle
  * equi-join — shingles with document frequency above a cap are
  * excluded from candidate GENERATION (a hot boilerplate shingle
  * would fan out quadratically), while the containment DENOMINATOR
  * still counts every shingle of the contained doc, so the score
  * semantics stay exact for pairs the rare-shingle blocker surfaces.
  * Prefix dedup is one hash aggregate on a constant-width key.
  * Both are never all-pairs over documents.
  */
object LlmOps10 {

  // ---- llm_minhash_containment -------------------------------------
  // Asymmetric containment |A∩B| / |A| (A the smaller shingle set)
  // over 3-token shingles, surfaced for pairs ≥ 0.5. Candidate
  // pairs require a shared shingle with document frequency ≤ 20 —
  // the rare-shingle blocking that keeps the per-key fan-out
  // bounded; |A∩B| then counts ALL shared shingles of a surfaced
  // pair via a second equi-join restricted to the candidate ids.
  private def containment(s: SparkSession, dir: String): DataFrame = {
    val grams = load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3, 1), " +
          "i -> md5(array_join(slice(t, i + 1, 3), ' ')))")).as("h"))
      .distinct()
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val rare = grams
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("df") <= 20)
      .drop("df")
    val cand = rare.as("a").join(rare.as("b"), Seq("h"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val shared = grams.as("ga")
      .join(cand, col("ga.doc_id") === col("doc_a"))
      .join(grams.as("gb"),
        col("gb.doc_id") === col("doc_b") && col("ga.h") === col("gb.h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb"))), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("sa"), col("sb")).cast("double"), 6).as("containment"))
      .filter(col("containment") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  private val containmentOracle =
    """WITH g AS (
      |  SELECT DISTINCT doc_id,
      |    md5(array_to_string(
      |      list_slice(t, CAST(i AS INT), CAST(i AS INT) + 2), ' ')) AS h
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |        WHERE len(t) >= 3)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
      |rare AS (
      |  SELECT doc_id, h FROM (
      |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df FROM g)
      |  WHERE df <= 20),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id),
      |shared AS (
      |  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared
      |  FROM cand
      |  JOIN g ga ON ga.doc_id = doc_a
      |  JOIN g gb ON gb.doc_id = doc_b AND ga.h = gb.h
      |  GROUP BY doc_a, doc_b)
      |SELECT doc_a, doc_b, n_shared,
      |  round(CAST(n_shared AS DOUBLE) /
      |    CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) AS containment
      |FROM shared
      |JOIN sz sa ON sa.doc_id = doc_a
      |JOIN sz sb ON sb.doc_id = doc_b
      |WHERE CAST(n_shared AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- llm_prefix_dedup --------------------------------------------
  // Template-intro detection: documents sharing an identical 8-token
  // PREFIX (boilerplate heads that whole-doc hashes and shingle
  // Jaccard both dilute). One hash aggregate on the constant-width
  // prefix hash; groups of one are dropped; the id checksum
  // (DECIMAL-accumulated, VARCHAR-surfaced) proves group membership,
  // not just sizes.
  private def prefixDedup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"),
        md5(array_join(slice(col("t"), 1, 8), " ")).as("prefix_hash"))
      .groupBy("prefix_hash")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("keeper"),
        sum(col("doc_id").cast("decimal(38,0)")).cast("string").as("id_checksum"))
      .filter(col("n_docs") > 1)
      .orderBy("prefix_hash")

  private val prefixOracle =
    """WITH p AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
      |      AS prefix_hash
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8)
      |SELECT prefix_hash, CAST(count(*) AS BIGINT) AS n_docs,
      |  min(doc_id) AS keeper,
      |  CAST(CAST(sum(doc_id) AS DECIMAL(38,0)) AS VARCHAR) AS id_checksum
      |FROM p GROUP BY prefix_hash HAVING count(*) > 1
      |ORDER BY prefix_hash""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_minhash_containment" -> (containment _),
    "llm_prefix_dedup" -> (prefixDedup _)
  )

  val oracle: Map[String, String] = Map(
    "llm_minhash_containment" -> containmentOracle,
    "llm_prefix_dedup" -> prefixOracle
  )
}
