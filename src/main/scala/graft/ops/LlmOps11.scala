package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.24 (continued) — round-13 corpus-profiling operators:
  * a code-vs-prose detector (the symbol-density + keyword heuristic
  * corpus pipelines use to route code out of prose training mixes)
  * and Flesch readability scoring.
  *
  * Both are single-scan map work folded into one per-(source) hash
  * aggregate — no shuffle beyond the final |sources|-sized group.
  * Feature counts are exact integers per document; the per-doc score
  * arithmetic is identical IEEE expressions on both engines, and the
  * only cross-engine float hazard (summation order inside avg) is
  * absorbed by 6-dp rounding.
  */
object LlmOps11 {

  // ---- llm_code_detect ---------------------------------------------
  // score = 100·(code symbols / chars) + 5·(distinct code keywords
  // present); flagged at score ≥ 5. Symbols counted by one regex
  // class, keywords by position probes — both dialect-portable.
  private val codeKeywords = Seq("def ", "return", "import ", "void ",
    "function ", "class ")

  private def codeDetect(s: SparkSession, dir: String): DataFrame = {
    val kwHits = codeKeywords
      .map(k => when(instr(col("text"), k) > 0, 1).otherwise(0))
      .reduce(_ + _)
    load(s, dir, "documents")
      .select(col("source"),
        (lit(100.0) * regexp_count(col("text"), lit("[{}();=<>\\[\\]]"))
            .cast("double") /
          greatest(lit(1L), length(col("text"))).cast("double") +
          lit(5.0) * kwHits.cast("double")).as("score"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= 5.0, 1L).otherwise(0L)).cast("bigint")
          .as("n_code"),
        round(avg(col("score")), 6).as("avg_score"))
      .orderBy("source")
  }

  private val codeDetectOracle = {
    val kw = codeKeywords
      .map(k => s"CAST(instr(text, '$k') > 0 AS INT)").mkString(" + ")
    s"""WITH d AS (
       |  SELECT source,
       |    100.0 * CAST(len(regexp_extract_all(text, '[{}();=<>\\[\\]]')) AS DOUBLE) /
       |      CAST(greatest(1, length(text)) AS DOUBLE) +
       |      5.0 * CAST($kw AS DOUBLE) AS score
       |  FROM documents)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN score >= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
       |  round(avg(score), 6) AS avg_score
       |FROM d GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- llm_readability ---------------------------------------------
  // Flesch reading ease and Flesch–Kincaid grade per source, with
  // syllables approximated by vowel-group runs (the standard
  // dictionary-free estimate) and sentence count clamped ≥ 1.
  private def readability(s: SparkSession, dir: String): DataFrame = {
    val words = size(split(col("text"), " ")).cast("double")
    val sents = greatest(lit(1), regexp_count(col("text"), lit("[.!?]")))
      .cast("double")
    val syl = greatest(lit(1),
      regexp_count(col("text"), lit("[aeiouyAEIOUY]+"))).cast("double")
    load(s, dir, "documents")
      .select(col("source"),
        (lit(206.835) - lit(1.015) * (words / sents) -
          lit(84.6) * (syl / words)).as("fre"),
        (lit(0.39) * (words / sents) + lit(11.8) * (syl / words) -
          lit(15.59)).as("fk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("fre")), 6).as("avg_reading_ease"),
        round(avg(col("fk")), 6).as("avg_fk_grade"))
      .orderBy("source")
  }

  private val readabilityOracle =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
      |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS DOUBLE)
      |      AS sents,
      |    CAST(greatest(1, len(regexp_extract_all(text, '[aeiouyAEIOUY]+')))
      |      AS DOUBLE) AS syl
      |  FROM documents),
      |f AS (
      |  SELECT source,
      |    206.835 - 1.015 * (w / sents) - 84.6 * (syl / w) AS fre,
      |    0.39 * (w / sents) + 11.8 * (syl / w) - 15.59 AS fk
      |  FROM d)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(avg(fre), 6) AS avg_reading_ease,
      |  round(avg(fk), 6) AS avg_fk_grade
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_code_detect" -> (codeDetect _),
    "llm_readability" -> (readability _)
  )

  val oracle: Map[String, String] = Map(
    "llm_code_detect" -> codeDetectOracle,
    "llm_readability" -> readabilityOracle
  )
}
