package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.88 (round-16 batch 4) — reliability statistics:
  *
  *  - [[cronbachIcc]]: Cronbach's α and the one-way intraclass
  *    correlation ICC(1,1) over the day × event-type count matrix
  *    (days = subjects, the 5 event types = items/raters) — the
  *    internal-consistency/agreement pair the correlation family
  *    lacked (`agg_corr_matrix` gives pairwise r's; α answers "do
  *    the five series measure ONE underlying daily activity
  *    factor?", ICC "how much variance is the day effect?").
  *    α = k/(k−1)·(1 − ΣVᵢ/V_tot) computed from the SCALED exact
  *    variances Vᵢ = n·Σx² − (Σx)² — the n(n−1) denominators cancel,
  *    so α is exact-integer arithmetic until ONE double assembly.
  *    ICC(1,1) = (MSB − MSW)/(MSB + (k−1)·MSW) from the same sums.
  *
  * Scale shape: ONE hash aggregate builds the dense day × 5 pivot
  * (fixed event-type alphabet — the agg_anova_f discipline; zero
  * days fill as 0 by construction), ONE 1-row aggregate collects all
  * twelve exact BIGINT sums; everything after is literal arithmetic.
  * Two passes over |days| rows, one over raw events.
  *
  * Determinism: all sums exact BIGINT; α/ICC assemble once from
  * identical formula text (fixed-order additions of exact integers
  * onto a double), floor-6 surfaced; nullif guards the degenerate
  * zero-variance denominators.
  */
object Composite75 {

  private val Types = Seq("click", "error", "purchase", "signup", "view")

  private def idx = Types.indices

  // ΣVᵢ / Σqᵢ in fixed left-assoc order over the exact BIGINT
  // columns; the leading CAST makes the whole chain double.
  private val vSum =
    idx.map(i => if (i == 0) s"CAST(v0 AS DOUBLE)" else s"v$i")
      .mkString("(", " + ", ")")
  private val qSum =
    idx.map(i => if (i == 0) s"CAST(q0 AS DOUBLE)" else s"q$i")
      .mkString("(", " + ", ")")

  private val K = 5
  private val alphaText =
    s"((CAST($K AS DOUBLE)/${K - 1})*(1 - $vSum/nullif(CAST(vt AS DOUBLE), 0)))"
  // One-way ANOVA mean squares from the same sums: MSB over day
  // effects, MSW the residual; G = ss (grand sum), Σx² = qSum,
  // Σ_t s_t² = qq.
  private val msb =
    s"((CAST(qq AS DOUBLE)/$K - CAST(ss AS DOUBLE)*ss/($K*n))/(n - 1))"
  private val msw =
    s"(($qSum - CAST(qq AS DOUBLE)/$K)/(n*${K - 1}))"
  private val iccText =
    s"(($msb - $msw)/nullif($msb + ${K - 1}*$msw, 0))"

  private[graft] def cronbachIccOn(events: DataFrame): DataFrame = {
    val pivots = Types.zipWithIndex.map { case (t, i) =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"x$i") }
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("d"))
      .agg(pivots.head, pivots.tail: _*)
    val rowSum = idx.map(i => col(s"x$i")).reduce(_ + _)
    val sums =
      (count(lit(1)).as("n") +:
        idx.map(i => sum(col(s"x$i")).as(s"s$i"))) ++
      idx.map(i => sum(col(s"x$i") * col(s"x$i")).as(s"q$i")) ++
      Seq(sum(rowSum).as("ss"), sum(rowSum * rowSum).as("qq"))
    val g = daily.groupBy().agg(sums.head, sums.tail: _*)
    val vCols =
      idx.map(i => s"n*q$i - s$i*s$i AS v$i") ++
      Seq("n*qq - ss*ss AS vt")
    g.selectExpr(("n" +: idx.map(i => s"q$i") :+ "ss" :+ "qq") ++ vCols: _*)
      .selectExpr("CAST(n AS BIGINT) AS n_days",
        s"floor(($alphaText)*1e6 + 0.5)/1e6 AS cronbach_alpha",
        s"floor(($iccText)*1e6 + 0.5)/1e6 AS icc_1_1")
  }

  private def cronbachIcc(s: SparkSession, dir: String): DataFrame =
    cronbachIccOn(loadEvents(s, dir))

  private val cronbachIccOracle = {
    val pivotDefs = Types.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS x$i" }.mkString(",\n    ")
    val rowSum = idx.map(i => s"x$i").mkString(" + ")
    val sumDefs = (
      idx.map(i => s"CAST(sum(x$i) AS BIGINT) AS s$i") ++
      idx.map(i => s"CAST(sum(x$i*x$i) AS BIGINT) AS q$i") ++
      Seq(s"CAST(sum($rowSum) AS BIGINT) AS ss",
        s"CAST(sum(($rowSum)*($rowSum)) AS BIGINT) AS qq")
      ).mkString(",\n    ")
    val vDefs = (idx.map(i => s"n*q$i - s$i*s$i AS v$i") ++
      Seq("n*qq - ss*ss AS vt")).mkString(",\n    ")
    s"""WITH daily AS (
       |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    $pivotDefs
       |  FROM events GROUP BY 1),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    $sumDefs
       |  FROM daily),
       |v AS (
       |  SELECT n, ${idx.map(i => s"q$i").mkString(", ")}, ss, qq,
       |    $vDefs
       |  FROM g)
       |SELECT CAST(n AS BIGINT) AS n_days,
       |  floor(($alphaText)*1e6 + 0.5)/1e6 AS cronbach_alpha,
       |  floor(($iccText)*1e6 + 0.5)/1e6 AS icc_1_1
       |FROM v""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_cronbach_icc" -> (cronbachIcc _)
  )

  val oracle: Map[String, String] = Map(
    "agg_cronbach_icc" -> cronbachIccOracle
  )
}
