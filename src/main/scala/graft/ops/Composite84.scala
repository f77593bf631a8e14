package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.90 (round-18 batch 4) — pipeline data-quality audits
  * and a second change-point lens:
  *
  *  - `dq_embedding_norms`: the L2-norm + dimension audit of the
  *    embedding table — the FIRST check before any ANN/semantic-dedup
  *    run (a mixed-dimension batch breaks every distance; zero
  *    vectors poison cosine; a drifted norm distribution flags a
  *    re-encode). Per-row sums fold left in array order on both
  *    engines (identical-input arithmetic), the norm is floored to
  *    exact micro-units per row (the nDCG summary discipline), and
  *    every aggregate — mean, population std, min/max, zero count,
  *    dimension spread — assembles from exact BIGINT/DECIMAL micro
  *    moments with one division each.
  *  - `dq_hash_uniformity`: χ² uniformity audit of the 256-bucket
  *    md5 split that `llm_sample_hash` keys on — the auditable
  *    guarantee behind every hash-sampled split (if the bucket
  *    histogram is skewed, every downstream sample inherits bias).
  *    χ² = (256·Σo² − n²)/n is EXACT integers until one double
  *    division; verdict vs the pinned χ²₂₅₅ 5% point 293.2478.
  *  - `evt_buishand_range`: Buishand's rescaled-range change-point
  *    statistic per event type — the CUMULATIVE-DEVIATION lens
  *    beside `evt_pettitt_changepoint`'s rank lens (Pettitt reacts
  *    to a median shift, Buishand R to sustained drift of the mean;
  *    the pair is the standard homogeneity battery). Scaled partial
  *    sums S'_t = T·cum_t − t·Σx are exact BIGINTs (no rational
  *    mean ever materializes), R' = max S' − min S' exact, and the
  *    rescaled R/(s√T) = R'/(√(T·Σx²−(Σx)²)·√T) is one shared-text
  *    expression over exact integers (critical values are tabulated
  *    per T — Buishand 1982 — so the row surfaces the statistic, the
  *    Quade convention).
  */
object Composite84 {

  // ---- dq_embedding_norms --------------------------------------------
  private val enSelect = Seq("n_vectors", "n_dims_distinct",
    "dim_min", "dim_max", "n_zero",
    "round(CAST(sm AS DOUBLE)/nullif(CAST(n_vectors AS DOUBLE), 0)/1e6, 6) AS mean_norm",
    """round(sqrt(greatest(0.0E0,
      |  (CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)*CAST(sm AS DOUBLE)
      |     /nullif(CAST(n_vectors AS DOUBLE), 0))
      |  /nullif(CAST(n_vectors AS DOUBLE), 0)))/1e6, 6) AS std_norm""".stripMargin,
    "CAST(mmin AS DOUBLE)/1e6 AS min_norm",
    "CAST(mmax AS DOUBLE)/1e6 AS max_norm")

  private[graft] def embeddingNormsOn(vectors: DataFrame): DataFrame = {
    val per = vectors.select(
      size(col("embedding")).cast("bigint").as("dim"),
      expr("""CAST(floor(sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
          |  (acc, v) -> acc + CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))*1e6 + 0.5)
          | AS BIGINT)""".stripMargin).as("m"))
    per.agg(
      count(lit(1)).as("n_vectors"),
      countDistinct(col("dim")).as("n_dims_distinct"),
      min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
      sum((col("m") === 0L).cast("long")).cast("bigint").as("n_zero"),
      sum(expr("CAST(m AS DECIMAL(38,0))")).as("sm"),
      sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("smm"),
      min(col("m")).as("mmin"), max(col("m")).as("mmax"))
      .selectExpr(enSelect: _*)
  }

  private def embeddingNorms(s: SparkSession, dir: String): DataFrame =
    embeddingNormsOn(load(s, dir, "embeddings"))

  private val enOracle =
    s"""WITH per AS (
       |  SELECT CAST(len(embedding) AS BIGINT) AS dim,
       |    CAST(floor(sqrt(list_sum(list_transform(embedding,
       |      v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))*1e6 + 0.5)
       |     AS BIGINT) AS m
       |  FROM embeddings),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       |    CAST(count(DISTINCT dim) AS BIGINT) AS n_dims_distinct,
       |    min(dim) AS dim_min, max(dim) AS dim_max,
       |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |    sum(CAST(m AS DECIMAL(38,0))) AS sm,
       |    sum(CAST(m AS DECIMAL(38,0)) * m) AS smm,
       |    min(m) AS mmin, max(m) AS mmax
       |  FROM per)
       |SELECT ${enSelect.mkString(",\n  ")}
       |FROM g""".stripMargin

  // ---- dq_hash_uniformity ---------------------------------------------
  private val huChi2 =
    """(CAST(256*so2 - CAST(n_docs AS DECIMAL(38,0))*n_docs AS DOUBLE)
      |  / nullif(CAST(n_docs AS DOUBLE), 0))""".stripMargin
  private val huSelect = Seq("n_docs", "CAST(256 AS BIGINT) AS n_buckets",
    "bmin AS min_bucket", "bmax AS max_bucket",
    s"floor(($huChi2)*1e6 + 0.5)/1e6 AS chi2",
    s"(($huChi2) < 293.2478E0) AS uniform_ok_5pct")

  private[graft] def hashUniformityOn(docs: DataFrame, idCol: String): DataFrame = {
    val buckets = docs
      .select(expr(s"substr(md5(CAST($idCol AS STRING)), 1, 2)").as("bk"))
      .groupBy(col("bk")).agg(count(lit(1)).as("o"))
    buckets.agg(
      sum(col("o")).cast("bigint").as("n_docs"),
      sum(expr("CAST(o AS DECIMAL(38,0)) * o")).as("so2"),
      min(col("o")).as("bmin"), max(col("o")).as("bmax"))
      .selectExpr(huSelect: _*)
  }

  private def hashUniformity(s: SparkSession, dir: String): DataFrame =
    hashUniformityOn(load(s, dir, "documents"), "doc_id")

  private val huOracle =
    s"""WITH b AS (
       |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bk,
       |    CAST(count(*) AS BIGINT) AS o
       |  FROM documents GROUP BY 1),
       |g AS (
       |  SELECT CAST(sum(o) AS BIGINT) AS n_docs,
       |    sum(CAST(o AS DECIMAL(38,0)) * o) AS so2,
       |    min(o) AS bmin, max(o) AS bmax
       |  FROM b)
       |SELECT ${huSelect.mkString(",\n  ")}
       |FROM g""".stripMargin

  // ---- evt_buishand_range ---------------------------------------------
  private val brSelect = Seq("event_type", "n_days",
    """floor((CAST(rr AS DOUBLE)/nullif(CAST(n_days AS DOUBLE), 0))*1e6 + 0.5)/1e6
      | AS buishand_r""".stripMargin,
    """floor((CAST(rr AS DOUBLE)
      |  / nullif(sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE))
      |      * sqrt(CAST(n_days AS DOUBLE)), 0))*1e6 + 0.5)/1e6
      | AS r_rescaled""".stripMargin)

  private[graft] def buishandOn(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("bigint").as("dd"))
      .groupBy(col("event_type"), col("dd"))
      .agg(count(lit(1)).as("y"))
    val byType = Window.partitionBy(col("event_type"))
    // S'_t = T·cum_t − t·Σx: exact BIGINTs (the mean never
    // materializes as a rational); S'_0 = S'_T = 0 are members of the
    // range by construction, so max ≥ 0 ≥ min without special rows.
    val sp = daily
      .withColumn("tt", count(lit(1)).over(byType))
      .withColumn("sx", sum(col("y")).over(byType))
      .withColumn("sxx", sum(col("y") * col("y")).over(byType))
      .withColumn("cum", sum(col("y")).over(byType.orderBy(col("dd"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx", row_number().over(byType.orderBy(col("dd"))))
      .select(col("event_type"), col("tt"), col("sx"), col("sxx"),
        (col("tt") * col("cum") - col("idx") * col("sx")).as("s2"))
    sp.groupBy(col("event_type"))
      .agg(max(col("tt")).as("n_days"), max(col("sx")).as("sx"),
        max(col("sxx")).as("sxx"),
        (greatest(max(col("s2")), lit(0L)) -
          least(min(col("s2")), lit(0L))).as("rr"))
      .selectExpr(brSelect: _*)
      .orderBy("event_type")
  }

  private def buishand(s: SparkSession, dir: String): DataFrame =
    buishandOn(loadEvents(s, dir))

  private val brOracle =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dd,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |sp AS (
       |  SELECT event_type,
       |    CAST(count(*) OVER w0 AS BIGINT) AS tt,
       |    CAST(sum(y) OVER w0 AS BIGINT) AS sx,
       |    CAST(sum(y*y) OVER w0 AS BIGINT) AS sxx,
       |    CAST(count(*) OVER w0 AS BIGINT)
       |      * CAST(sum(y) OVER (PARTITION BY event_type ORDER BY dd
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - CAST(row_number() OVER (PARTITION BY event_type ORDER BY dd) AS BIGINT)
       |      * CAST(sum(y) OVER w0 AS BIGINT) AS s2
       |  FROM daily
       |  WINDOW w0 AS (PARTITION BY event_type)),
       |g AS (
       |  SELECT event_type, max(tt) AS n_days, max(sx) AS sx,
       |    max(sxx) AS sxx,
       |    greatest(max(s2), 0) - least(min(s2), 0) AS rr
       |  FROM sp GROUP BY 1)
       |SELECT ${brSelect.mkString(",\n  ")}
       |FROM g
       |ORDER BY event_type""".stripMargin

  // ---- registration ------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_embedding_norms" -> (embeddingNorms _),
    "dq_hash_uniformity" -> (hashUniformity _),
    "evt_buishand_range" -> (buishand _)
  )

  val oracle: Map[String, String] = Map(
    "dq_embedding_norms" -> enOracle,
    "dq_hash_uniformity" -> huOracle,
    "evt_buishand_range" -> brOracle
  )
}
