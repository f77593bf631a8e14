package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.22 (continued) — round-11 corpus-distribution
  * audits: per-document term burstiness (the variance-to-mean
  * repetitiveness signal), per-source KL divergence against the
  * corpus unigram distribution (which crawl source is most
  * off-distribution), and MAD-based document-length outlier counts
  * per language (the robust-statistics twin of the z-score filter).
  *
  * Scale shapes: burstiness is the llm_token_entropy two-shuffle
  * plan ((doc, word) → doc, both hash aggregates map-side
  * combining); KL joins the |sources|×|vocab| grid (vocab is
  * Heaps-sublinear, sources a handful) against broadcast per-source
  * constants; length-MAD aggregates per language twice (median,
  * then median of absolute deviations) with the 5-row median table
  * broadcast back — never a per-doc sort.
  *
  * Float determinism: burstiness moments are exact integer sums;
  * KL's per-term ln ratios are identical-input libm calls whose
  * vocab-sized accumulation drift is absorbed by 6-dp rounding (the
  * llm_lm_score argument); MAD interpolation follows the
  * agg_percentile_cont precedent (both engines linearly interpolate
  * identically on exact integer inputs).
  */
object LlmOps9 {

  // ---- llm_burstiness ----------------------------------------------
  // Per-document term burstiness: population variance-to-mean ratio
  // of the document's term-frequency vector. VMR ≈ 1 is Poisson-like
  // prose; VMR ≫ 1 marks bursty/repetitive docs that length or
  // distinct-ratio gates miss. Moments are exact: k types, Σc, Σc²
  // — VMR = (Σc²/k − (Σc/k)²)/(Σc/k) as one shared-text double
  // expression.
  private val vmrTerm =
    "round((CAST(scc AS DOUBLE) / CAST(k AS DOUBLE) - " +
      "(CAST(sc AS DOUBLE) / CAST(k AS DOUBLE)) * " +
      "(CAST(sc AS DOUBLE) / CAST(k AS DOUBLE))) / " +
      "(CAST(sc AS DOUBLE) / CAST(k AS DOUBLE)), 6)"

  private def burstiness(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("k"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .select(col("doc_id"), col("sc").cast("bigint").as("n_tokens"),
        col("k").cast("bigint").as("n_types"), expr(vmrTerm).as("vmr"))
      .orderBy("doc_id")

  private val burstinessOracle =
    s"""WITH tc AS (
       |  SELECT doc_id, w, count(*) AS c
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  GROUP BY doc_id, w),
       |m AS (
       |  SELECT doc_id, count(*) AS k, sum(c) AS sc, sum(c * c) AS scc
       |  FROM tc GROUP BY doc_id)
       |SELECT doc_id, CAST(sc AS BIGINT) AS n_tokens,
       |  CAST(k AS BIGINT) AS n_types, $vmrTerm AS vmr
       |FROM m ORDER BY doc_id""".stripMargin

  // ---- llm_kl_divergence -------------------------------------------
  // Per-source KL(source ‖ corpus) over the unigram distribution,
  // Laplace-smoothed on the source side (the corpus side is positive
  // for every vocab word by construction): the contamination audit
  // that ranks crawl sources by distribution shift. The sum runs
  // over the full |sources|×|vocab| grid — zero-count source words
  // still contribute smoothed mass — built as a tiny sources×vocab
  // cross join LEFT JOIN the per-(source,word) counts.
  private val klTerm =
    "((CAST(csw AS DOUBLE) + 1.0) / (CAST(ns AS DOUBLE) + CAST(v AS DOUBLE))) * " +
      "ln(((CAST(csw AS DOUBLE) + 1.0) / (CAST(ns AS DOUBLE) + CAST(v AS DOUBLE))) / " +
      "(CAST(cw AS DOUBLE) / CAST(n AS DOUBLE)))"

  private def klDivergence(s: SparkSession, dir: String): DataFrame = {
    val tok = load(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val vocab = sw.groupBy("w").agg(sum(col("csw")).as("cw"))
    val srcs = sw.groupBy("source").agg(sum(col("csw")).as("ns"))
    val consts = broadcast(
      vocab.agg(count(lit(1)).as("v"), sum(col("cw")).as("n")))
    broadcast(srcs).crossJoin(vocab)
      .join(sw, Seq("source", "w"), "left")
      .na.fill(0L, Seq("csw"))
      .crossJoin(consts)
      .groupBy(col("source"), col("ns"))
      .agg(round(sum(expr(klTerm)), 6).as("kl"))
      .select(col("source"), col("ns").cast("bigint").as("n_tokens"), col("kl"))
      .orderBy("source")
  }

  private val klOracle =
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       |sw AS (SELECT source, w, count(*) AS csw FROM tok GROUP BY source, w),
       |vocab AS (SELECT w, sum(csw) AS cw FROM sw GROUP BY w),
       |srcs AS (SELECT source, sum(csw) AS ns FROM sw GROUP BY source),
       |c AS (SELECT count(*) AS v, sum(cw) AS n FROM vocab),
       |grid AS (
       |  SELECT srcs.source, srcs.ns, vocab.w, vocab.cw,
       |    coalesce(sw.csw, 0) AS csw
       |  FROM srcs CROSS JOIN vocab
       |  LEFT JOIN sw ON sw.source = srcs.source AND sw.w = vocab.w)
       |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
       |  round(sum($klTerm), 6) AS kl
       |FROM grid CROSS JOIN c
       |GROUP BY source, ns ORDER BY source""".stripMargin

  // ---- llm_length_mad ----------------------------------------------
  // Robust per-language length outliers: median and MAD (median
  // absolute deviation) of n_chars, plus the count outside
  // median ± 3·MAD — the outlier gate that, unlike the z-score,
  // a few extreme documents cannot drag. Exact integer inputs;
  // both engines interpolate percentiles identically
  // (agg_percentile_cont precedent). The 5-row median table
  // broadcasts back for the deviation pass.
  private def lengthMad(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents").select(col("lang"), col("n_chars"))
    val med = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = docs.join(broadcast(med), "lang")
      .select(col("lang"), col("med"),
        abs(col("n_chars").cast("double") - col("med")).as("ad"))
    val madT = dev.groupBy(col("lang"), col("med"))
      .agg(count(lit(1)).as("n_docs"), expr("percentile(ad, 0.5)").as("mad"))
    dev.join(broadcast(madT.select(col("lang"), col("mad"))), "lang")
      .groupBy(col("lang"))
      .agg(sum(when(col("ad") > lit(3.0) * col("mad"), 1L).otherwise(0L))
        .as("n_outliers"))
      .join(madT, "lang")
      .select(col("lang"), col("n_docs"), col("med"), col("mad"),
        col("n_outliers"))
      .orderBy("lang")
  }

  private val lengthMadOracle =
    """WITH med AS (
      |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
      |  FROM documents GROUP BY lang),
      |dev AS (
      |  SELECT d.lang, med, abs(CAST(n_chars AS DOUBLE) - med) AS ad
      |  FROM documents d JOIN med ON d.lang = med.lang),
      |madt AS (
      |  SELECT lang, med, CAST(count(*) AS BIGINT) AS n_docs,
      |    quantile_cont(ad, 0.5) AS mad
      |  FROM dev GROUP BY lang, med),
      |o AS (
      |  SELECT dev.lang,
      |    CAST(sum(CASE WHEN ad > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_outliers
      |  FROM dev JOIN madt ON dev.lang = madt.lang
      |  GROUP BY dev.lang)
      |SELECT madt.lang, n_docs, med, mad, n_outliers
      |FROM madt JOIN o ON madt.lang = o.lang
      |ORDER BY madt.lang""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_burstiness" -> (burstiness _),
    "llm_kl_divergence" -> (klDivergence _),
    "llm_length_mad" -> (lengthMad _)
  )

  val oracle: Map[String, String] = Map(
    "llm_burstiness" -> burstinessOracle,
    "llm_kl_divergence" -> klOracle,
    "llm_length_mad" -> lengthMadOracle
  )
}
