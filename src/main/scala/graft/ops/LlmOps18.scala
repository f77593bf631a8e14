package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.82 (round-26 batch 4, corpus-statistics member) —
  * the Zipf rank-frequency fit:
  *
  *  - [[zipfFit]]: ln f ~ −α·ln r least squares over the top-1024
  *    token ranks — the missing twin of `llm_heaps_fit` (vocabulary
  *    GROWTH vs corpus size; this is vocabulary CONCENTRATION vs
  *    rank), and the number a tokenizer/sampling design reads first
  *    (how head-heavy is the distribution BPE will spend its merges
  *    on). Deterministic rank tiebreak (frequency DESC, token ASC);
  *    the head-rank cap is where the power law lives AND what keeps
  *    the fit relation bounded at corpus scale. The synthetic corpus
  *    draws from a ~31-word dictionary, so the cap is not binding at
  *    test SFs — the operator's contract (top-min(1024, |V|) ranks)
  *    is unchanged on a real corpus.
  *
  * Scale shape: one explode → token-count aggregate (vocabulary-
  * sized, map-side combining); the top-1024 selection is an
  * orderBy+limit, which Spark plans as TakeOrderedAndProject — a
  * distributed per-partition top-k plus one 1024-row merge, NEVER a
  * global sort of the vocabulary; the rank window then runs on the
  * ≤1024-row result. n_vocab rides in as a 1-row broadcast.
  *
  * Determinism: ranks and frequencies are exact; the OLS runs over
  * ≤1024 (ln r, ln f) points — unordered double sums whose
  * cross-engine drift is ~1e-13 relative (the llm_heaps_fit /
  * geometric-mean libm precedent), surfaced after the 6-dp floor.
  */
object LlmOps18 {

  private val ZfRankCap = 1024L

  // Slope b = (m·Σxy − Σx·Σy)/(m·Σx² − (Σx)²); α = −b; intercept
  // ln c = (Σy − b·Σx)/m, spelled with b inlined so the text is one
  // shared tree.
  private val zfB =
    "((CAST(m AS DOUBLE)*sxy - sx*sy) / nullif(CAST(m AS DOUBLE)*sx2 - sx*sx, 0))"
  private val zfFinal: Seq[String] = Seq(
    "n_vocab", "m AS n_ranks_fit",
    s"floor((-$zfB)*1e6 + 0.5)/1e6 AS zipf_alpha",
    s"floor(((sy - $zfB*sx) / CAST(m AS DOUBLE))*1e6 + 0.5)/1e6 AS ln_c")

  private[graft] def zipfFitOn(docs: DataFrame): DataFrame = {
    val freq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val head = freq
      .orderBy(col("f").desc, col("w").asc)
      .limit(ZfRankCap.toInt)
      .select(col("f"),
        row_number().over(
          Window.orderBy(col("f").desc, col("w").asc)).cast("long").as("r"))
    val nv = broadcast(freq.agg(count(lit(1)).as("n_vocab")))
    head
      .select(log(col("r").cast("double")).as("x"),
        log(col("f").cast("double")).as("y"))
      .groupBy()
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"))
      .crossJoin(nv)
      .selectExpr(zfFinal: _*)
  }

  private def zipfFit(s: SparkSession, dir: String): DataFrame =
    zipfFitOn(load(s, dir, "documents"))

  private val zipfFitOracle =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY w),
       |ranked AS (
       |  SELECT f, CAST(row_number() OVER (ORDER BY f DESC, w ASC)
       |    AS BIGINT) AS r
       |  FROM freq),
       |pts AS (
       |  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
       |  FROM ranked WHERE r <= $ZfRankCap),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m, sum(x) AS sx, sum(y) AS sy,
       |    sum(x*y) AS sxy, sum(x*x) AS sx2
       |  FROM pts),
       |v AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM freq)
       |SELECT ${zfFinal.mkString(",\n  ")}
       |FROM g CROSS JOIN v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_zipf_fit" -> (zipfFit _)
  )

  val oracle: Map[String, String] = Map(
    "llm_zipf_fit" -> zipfFitOracle
  )
}
