package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.87 (round-16 batch 2) — edit-distance dedup tier:
  *
  *  - [[dedupEditdist]]: Levenshtein-graded near-duplicates on
  *    prefix-blocked candidates — the GRADED verify tier the hash
  *    family lacks: `llm_prefix_dedup` says "same 8-token intro" but
  *    not how far the bodies have drifted; MinHash Jaccard grades
  *    shingle overlap but is blind to small in-place edits. Edit
  *    distance is the metric ACTUALLY meant by "lightly edited
  *    copy", and both engines ship the same unit-cost builtin.
  *    Candidates = pairs sharing the md5 of their first 8 tokens
  *    (THE `llm_prefix_dedup` key — a drifted block definition would
  *    red both rows); distance = levenshtein on the first 512 chars
  *    (the cap bounds the O(len²) DP per pair); similarity =
  *    1 − lev/max(len) on the capped strings.
  *
  * Scale shape: blocking is a hash equi-join on the prefix key —
  * never all-pairs. Hot boilerplate blocks are the quadratic hazard
  * (a template intro shared by 1e6 docs is 5e11 pairs), so each
  * block keeps only its `BlockCap` smallest doc_ids (deterministic
  * row_number cap, mirrored in the oracle — the SliceCap discipline;
  * at the current corpus no block nears the cap, so results are
  * unchanged and tri-SF-asserted). The per-pair DP cost is bounded
  * by the 512-char cap: ≤ 0.26 MB of DP cells per pair, pure map
  * work after the self-join.
  *
  * Determinism: levenshtein is exact-integer in both engines (unit
  * costs, the classic DP); lengths are exact INTs; the one double is
  * the similarity ratio, assembled once from identical formula text.
  */
object LlmOps21 {

  private val BlockCap = 32
  private val CharCap = 512

  private[graft] def dedupEditdistOn(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ph")).orderBy(col("doc_id"))
    val cands = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        substring(col("text"), 1, CharCap).as("head"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), col("head"),
        md5(array_join(slice(col("t"), 1, 8), " ")).as("ph"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= BlockCap)
      .select(col("doc_id"), col("head"), col("ph"))
      .localCheckpoint() // both self-join sides read one build
    cands.select(col("ph"), col("doc_id").as("doc_a"),
        col("head").as("head_a"))
      .join(cands.select(col("ph"), col("doc_id").as("doc_b"),
        col("head").as("head_b")), "ph")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("head_a"), col("head_b")).as("lev"),
        length(col("head_a")).as("len_a"), length(col("head_b")).as("len_b"))
      .selectExpr("doc_a", "doc_b", "lev", "len_a", "len_b",
        """floor((1.0 - CAST(lev AS DOUBLE)
          | / nullif(greatest(len_a, len_b), 0))*1e6 + 0.5)/1e6
          | AS head_similarity""".stripMargin)
      .orderBy("doc_a", "doc_b")
  }

  private def dedupEditdist(s: SparkSession, dir: String): DataFrame =
    dedupEditdistOn(load(s, dir, "documents"))

  private val dedupEditdistOracle =
    s"""WITH c0 AS (
       |  SELECT doc_id,
       |    substring(text, 1, $CharCap) AS head,
       |    md5(array_to_string(list_slice(string_split(text, ' '), 1, 8),
       |      ' ')) AS ph
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 8),
       |cands AS (
       |  SELECT doc_id, head, ph FROM (
       |    SELECT *, row_number() OVER (PARTITION BY ph ORDER BY doc_id)
       |      AS rn
       |    FROM c0)
       |  WHERE rn <= $BlockCap),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(levenshtein(a.head, b.head) AS INT) AS lev,
       |    CAST(length(a.head) AS INT) AS len_a,
       |    CAST(length(b.head) AS INT) AS len_b
       |  FROM cands a JOIN cands b
       |    ON a.ph = b.ph AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, lev, len_a, len_b,
       |  floor((1.0 - CAST(lev AS DOUBLE)
       |   / nullif(greatest(len_a, len_b), 0))*1e6 + 0.5)/1e6
       |   AS head_similarity
       |FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_editdist" -> (dedupEditdist _)
  )

  val oracle: Map[String, String] = Map(
    "llm_dedup_editdist" -> dedupEditdistOracle
  )
}
