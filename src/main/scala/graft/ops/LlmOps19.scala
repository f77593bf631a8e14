package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.83 (round-26 batch 5) — LSH capacity auditing:
  *
  *  - [[lshBucketAudit]]: per-band bucket-size audit of the banded
    * signature scheme — bucket count, largest bucket, candidate
  *    pairs Σc(c−1)/2, and the largest bucket's share of those
  *    pairs. This is the number that decides whether the LSH
  *    self-join is runnable at scale: candidate pairs are the join's
  *    output size and a hot bucket is its skew (one boilerplate
  *    bucket of 10⁶ docs is 5·10¹¹ pairs on one key). The signature
  *    here is the md5-matrix DETERMINISTIC twin (8 per-seed min-
  *    hashes over 3-token shingles, 4 bands of 2) — same twin
  *    discipline as `llm_dedup_near_verified`: the production
  *    xxhash64 path stays ✗-class, the audit's every stage is
  *    re-derived by the oracle.
  *
  *  - [[shingleDfSpectrum]]: the document-frequency spectrum of
  *    3-token shingles (df = 1 / 2 / 3-4 / 5-8 / 9-16 / 17+) — the
  *    tuning signal behind `llm_minhash_containment`'s rare-shingle
  *    (df ≤ 20) candidate pushdown: the unique/rare mass is the
  *    index that generates candidates, the hot tail is the slice
  *    that must be handled by correction joins instead.
  *
  * Scale shapes: one shingle explode + distinct each (the LlmOps10
  * gram relation); the audit's signature is ONE doc-keyed 8-min
  * aggregate (map-side combining) → 4 band keys stacked →
  * (band, key) counts → a 4-row final; the spectrum is ONE
  * shingle-keyed count → a ≤6-row bucket aggregate with the total
  * as a 1-row broadcast.
  *
  * Determinism: md5 hex strings order identically in both engines
  * (ASCII, lowercase), so per-seed mins, band keys, and every count
  * are exact; the only doubles are the final share ratios of exact
  * BIGINTs from shared text, floor-6.
  */
object LlmOps19 {

  private val LshSeeds = 8
  private val LshBands = 4 // bands of 2 rows

  /** Distinct (doc_id, 3-token shingle) — the LlmOps10 gram text.
    * Pure seam (planted tests pass their own docs). Corpus-facing
    * consumers go through [[sharedGrams]]. */
  private[graft] def grams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3, 1), " +
          "i -> array_join(slice(t, i + 1, 3), ' '))")).as("h"))
      .distinct()

  /** Corpus-facing distinct trigram relation as a [[DiskMemo]] parquet
    * materialized view (r18, the coPurchaseHalfEdges discipline):
    * FOUR rows consume this one relation — `llm_minhash_containment`,
    * `llm_lsh_bucket_audit`, `llm_shingle_df_spectrum`,
    * `llm_source_novelty` — and until r17 each re-ran the tokenize +
    * shingle-explode + DISTINCT pipeline per invocation. Content is an
    * exact string SET (deterministic; row order irrelevant to every
    * consumer — all aggregate). The build is timed as its own bench
    * row (`memo_grams3`). */
  private[graft] def sharedGrams(s: SparkSession, dir: String): DataFrame =
    DiskMemo.table(s, dir, "grams3")(grams(load(s, dir, "documents")))

  /** Corpus-facing inverted index — shingle → SORTED distinct doc_id
    * array over [[sharedGrams]] — as a [[DiskMemo]] parquet view
    * (r19, VERDICT r18 item 6): `llm_minhash_containment` rebuilt and
    * checkpointed this h-keyed collect_set per invocation, and
    * `llm_shingle_df_spectrum` (df = size(ds)) and
    * `llm_source_novelty` (owner = ds[1], the min doc of the sorted
    * set) each re-ran their own h-keyed aggregate over the same gram
    * relation. Content is deterministic — array_sort pins the
    * collect_set order, ids are exact BIGINTs — and every consumer
    * aggregates, so row order is irrelevant. Build timed as bench row
    * `memo_shingle_postings` (reads the grams3 view, like every other
    * layered memo). */
  private[graft] def sharedPostings(s: SparkSession, dir: String): DataFrame =
    DiskMemo.table(s, dir, "shingle_postings")(
      sharedGrams(s, dir).groupBy(col("h"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds")))

  // ---- llm_lsh_bucket_audit -------------------------------------------------
  private val lshFinal: Seq[String] = Seq(
    "band", "nb AS n_buckets", "mx AS max_bucket",
    "cp AS candidate_pairs",
    "floor((CAST(mx*(mx - 1) div 2 AS DOUBLE)" +
      " / nullif(CAST(cp AS DOUBLE), 0))*1e6 + 0.5)/1e6 AS hot_share")

  private[graft] def lshBucketAuditOn(docs: DataFrame): DataFrame =
    lshBucketAuditOnGrams(grams(docs))

  private[graft] def lshBucketAuditOnGrams(g: DataFrame): DataFrame = {
    val mins = (0 until LshSeeds).map(s0 =>
      min(md5(concat(lit(s"$s0|"), col("h")))).as(s"m$s0"))
    val sig = g.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
    val bandCols = (0 until LshBands).map(b =>
      md5(concat(col(s"m${2 * b}"), col(s"m${2 * b + 1}"))).as(s"b$b"))
    val stackArgs = (0 until LshBands)
      .map(b => s"CAST($b AS BIGINT), b$b").mkString(", ")
    sig.select(bandCols: _*)
      .selectExpr(s"stack($LshBands, $stackArgs) AS (band, bk)")
      .groupBy(col("band"), col("bk"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("nb"), max(col("c")).as("mx"),
        sum(expr("c*(c - 1) div 2")).as("cp"))
      .selectExpr(lshFinal: _*)
      .orderBy("band")
  }

  private def lshBucketAudit(s: SparkSession, dir: String): DataFrame =
    lshBucketAuditOnGrams(sharedGrams(s, dir))

  private val lshBucketAuditOracle = {
    val mins = (0 until LshSeeds)
      .map(s0 => s"min(md5(concat('$s0|', h))) AS m$s0").mkString(",\n    ")
    val bands = (0 until LshBands)
      .map(b => s"md5(concat(m${2 * b}, m${2 * b + 1})) AS b$b")
      .mkString(", ")
    val stack = (0 until LshBands)
      .map(b => s"SELECT CAST($b AS BIGINT) AS band, b$b AS bk FROM bandkeys")
      .mkString("\n  UNION ALL ")
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(
       |      generate_series(1, len(string_split(text, ' ')) - 2),
       |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
       |      AS h
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM grams GROUP BY doc_id),
       |bandkeys AS (SELECT doc_id, $bands FROM sig),
       |sb AS (
       |  $stack),
       |bc AS (SELECT band, bk, CAST(count(*) AS BIGINT) AS c
       |  FROM sb GROUP BY 1, 2),
       |g AS (
       |  SELECT band, CAST(count(*) AS BIGINT) AS nb,
       |    CAST(max(c) AS BIGINT) AS mx,
       |    CAST(sum(c*(c - 1)//2) AS BIGINT) AS cp
       |  FROM bc GROUP BY band)
       |SELECT ${lshFinal.map(_.replace(" div ", "//")).mkString(",\n  ")}
       |FROM g ORDER BY band""".stripMargin
  }

  // ---- llm_shingle_df_spectrum ---------------------------------------------
  // Power-of-two df bands with string labels that sort in band
  // order — the relation stays ≤6 rows whatever the corpus.
  private val dfBucket =
    """CASE WHEN df = 1 THEN '01_unique' WHEN df = 2 THEN '02_df2'
      |  WHEN df <= 4 THEN '03_df3_4' WHEN df <= 8 THEN '04_df5_8'
      |  WHEN df <= 16 THEN '05_df9_16' ELSE '06_df17plus' END""".stripMargin
  private val dfFinal: Seq[String] = Seq(
    "bucket", "ns AS n_shingles", "np AS n_postings",
    "floor((CAST(ns AS DOUBLE) / total)*1e6 + 0.5)/1e6 AS vocab_share")

  private[graft] def shingleDfSpectrumOn(docs: DataFrame): DataFrame =
    shingleDfSpectrumOnGrams(grams(docs))

  private[graft] def shingleDfSpectrumOnGrams(g: DataFrame): DataFrame =
    shingleDfSpectrumFromDfRel(
      g.groupBy(col("h")).agg(count(lit(1)).as("df")))

  /** Spectrum tail over a prebuilt (h, df) relation: the corpus path
    * projects df = size(ds) off the shared postings view (r19), so
    * the h-keyed count exchange disappears from this row entirely —
    * df values are identical (ds is the distinct doc set per h). */
  private def shingleDfSpectrumFromDfRel(dfRel: DataFrame): DataFrame = {
    val tot = broadcast(dfRel.agg(count(lit(1)).as("total")))
    dfRel.selectExpr(s"$dfBucket AS bucket", "df")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("ns"), sum(col("df")).as("np"))
      .crossJoin(tot)
      .selectExpr(dfFinal: _*)
      .orderBy("bucket")
  }

  private def shingleDfSpectrum(s: SparkSession, dir: String): DataFrame =
    shingleDfSpectrumFromDfRel(sharedPostings(s, dir)
      .select(col("h"), size(col("ds")).cast("bigint").as("df")))

  private val shingleDfSpectrumOracle =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(
       |      generate_series(1, len(string_split(text, ' ')) - 2),
       |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
       |      AS h
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |dfr AS (SELECT h, CAST(count(*) AS BIGINT) AS df
       |  FROM grams GROUP BY h),
       |b AS (SELECT $dfBucket AS bucket, df FROM dfr),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM dfr),
       |g AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS ns,
       |    CAST(sum(df) AS BIGINT) AS np
       |  FROM b GROUP BY bucket)
       |SELECT ${dfFinal.mkString(",\n  ")}
       |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_lsh_bucket_audit" -> (lshBucketAudit _),
    "llm_shingle_df_spectrum" -> (shingleDfSpectrum _)
  )

  val oracle: Map[String, String] = Map(
    "llm_lsh_bucket_audit" -> lshBucketAuditOracle,
    "llm_shingle_df_spectrum" -> shingleDfSpectrumOracle
  )
}
