package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.75 (round-25 batch 8) — lead-lag causality and the
  * partial correlogram:
  *
  *  - [[grangerLite]]: lag-1 Granger causality between the click and
  *    purchase daily series, BOTH directions — the F-test comparing
  *    the restricted AR(1) (y on its own lag) against the
  *    unrestricted model adding the other series' lag.
  *    `evt_cross_correlation` screens the raw lead-lag correlation;
  *    Granger asks the sharper question "does x's PAST improve the
  *    prediction of y beyond y's own past?". Lag 1, constant
  *    included, asymptotic F(1,∞) 5% critical 3.841459 (documented,
  *    mirrored in the oracle).
  *
  *  - [[pacfTable]]: the lag-1..7 PARTIAL autocorrelation table per
  *    event type via the Durbin-Levinson recursion, unrolled to 7
  *    fixed stages. `win_acf_table` shows total correlation at each
  *    lag; the PACF removes the shorter-lag pass-through — the pair
  *    is how an order is actually picked for an AR model.
  *
  * Scale shapes: Granger is the CCF day-pivot → 2 lag columns →
  * TWO 10-moment hash aggregates (one per direction) over the
  * |days|-bounded series; PACF reuses `Composite45.lagMoments`' one
  * co-moment aggregate, and the recursion is 7 chained 1-row
  * projection stages — no data motion at all after the aggregate.
  *
  * Determinism: all co-moments are exact (BIGINT counts; the
  * Granger cross-products in DECIMAL(38,0) with VARCHAR routing,
  * §1.5 r7/r9); both engines then run the IDENTICAL sequence of
  * double operations — the OLS/F assembly and each Durbin-Levinson
  * stage are generated ONCE as formula text and pasted into both
  * the Spark selectExpr chain and the oracle CTE chain, so
  * stage-k outputs are bit-identical; surfaced values floor-6.
  */
object Composite59 {

  // ---- evt_granger_lite ----------------------------------------------------
  private val GrX = "click"
  private val GrY = "purchase"

  // Centered moments from raw sums (m = #obs; u = own lag, v = cross
  // lag, w = target), then the q=1 F-test of dropping v.
  private val grStage1 = Seq(
    "suu - CAST(su AS DOUBLE)*su/m AS cuu",
    "svv - CAST(sv AS DOUBLE)*sv/m AS cvv",
    "sww - CAST(sw AS DOUBLE)*sw/m AS cww",
    "suv - CAST(su AS DOUBLE)*sv/m AS cuv",
    "suw - CAST(su AS DOUBLE)*sw/m AS cuw",
    "svw - CAST(sv AS DOUBLE)*sw/m AS cvw")
  private val grStage2 = Seq(
    "(cvv*cuw - cuv*cvw) / nullif(cuu*cvv - cuv*cuv, 0) AS bu",
    "(cuu*cvw - cuv*cuw) / nullif(cuu*cvv - cuv*cuv, 0) AS bv")
  private val grStage3 = Seq(
    "cww - bu*cuw - bv*cvw AS sse_u",
    "cww - cuw*cuw/nullif(cuu, 0) AS sse_r")
  private val grF =
    "(((sse_r - sse_u)*(m - 3)) / nullif(sse_u, 0))"
  private val grFF = s"floor(($grF)*1e6 + 0.5)/1e6"

  private[graft] def grangerOn(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("event_type").isin(GrX, GrY))
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("d"))
      .agg(sum(when(col("event_type") === GrX, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === GrY, 1L).otherwise(0L)).as("y"))
    val w = Window.orderBy("d") // |days|-bounded
    val shifted = daily
      .select(col("x"), col("y"),
        lag(col("x"), 1).over(w).as("xl"),
        lag(col("y"), 1).over(w).as("yl"))
      .filter(col("xl").isNotNull)
      .localCheckpoint()
    def leg(dirName: String, wc: String, uc: String, vc: String) =
      shifted
        .select(col(wc).as("w_"), col(uc).as("u_"), col(vc).as("v_"))
        .groupBy()
        .agg(count(lit(1)).as("m"),
          sum(col("u_")).as("su"), sum(col("v_")).as("sv"),
          sum(col("w_")).as("sw"),
          sum(expr("CAST(u_ AS DECIMAL(19,0)) * CAST(u_ AS DECIMAL(19,0))"))
            .cast("double").as("suu"),
          sum(expr("CAST(v_ AS DECIMAL(19,0)) * CAST(v_ AS DECIMAL(19,0))"))
            .cast("double").as("svv"),
          sum(expr("CAST(w_ AS DECIMAL(19,0)) * CAST(w_ AS DECIMAL(19,0))"))
            .cast("double").as("sww"),
          sum(expr("CAST(u_ AS DECIMAL(19,0)) * CAST(v_ AS DECIMAL(19,0))"))
            .cast("double").as("suv"),
          sum(expr("CAST(u_ AS DECIMAL(19,0)) * CAST(w_ AS DECIMAL(19,0))"))
            .cast("double").as("suw"),
          sum(expr("CAST(v_ AS DECIMAL(19,0)) * CAST(w_ AS DECIMAL(19,0))"))
            .cast("double").as("svw"))
        .selectExpr("*" +: grStage1: _*)
        .selectExpr("*" +: grStage2: _*)
        .selectExpr("*" +: grStage3: _*)
        .selectExpr(s"'$dirName' AS direction", "m AS n_obs",
          s"$grFF AS f_stat",
          s"($grFF > 3.841459) AS reject_no_cause_5pct")
    leg(s"$GrX->$GrY", "y", "yl", "xl")
      .unionAll(leg(s"$GrY->$GrX", "x", "xl", "yl"))
      .orderBy("direction")
  }

  private def grangerLite(s: SparkSession, dir: String): DataFrame =
    grangerOn(loadEvents(s, dir))

  private val grangerOracle = {
    def legSql(dirName: String, wc: String, uc: String, vc: String) =
      s"""SELECT '$dirName' AS direction, m AS n_obs,
         |  $grFF AS f_stat,
         |  ($grFF > 3.841459) AS reject_no_cause_5pct
         |FROM (SELECT *, ${grStage3.mkString(", ")}
         |  FROM (SELECT *, ${grStage2.mkString(", ")}
         |    FROM (SELECT *, ${grStage1.mkString(", ")}
         |      FROM (
         |        SELECT CAST(count(*) AS BIGINT) AS m,
         |          CAST(sum($uc) AS BIGINT) AS su,
         |          CAST(sum($vc) AS BIGINT) AS sv,
         |          CAST(sum($wc) AS BIGINT) AS sw,
         |          CAST(CAST(sum(CAST($uc AS DECIMAL(19,0))
         |            * CAST($uc AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS suu,
         |          CAST(CAST(sum(CAST($vc AS DECIMAL(19,0))
         |            * CAST($vc AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS svv,
         |          CAST(CAST(sum(CAST($wc AS DECIMAL(19,0))
         |            * CAST($wc AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sww,
         |          CAST(CAST(sum(CAST($uc AS DECIMAL(19,0))
         |            * CAST($vc AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS suv,
         |          CAST(CAST(sum(CAST($uc AS DECIMAL(19,0))
         |            * CAST($wc AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS suw,
         |          CAST(CAST(sum(CAST($vc AS DECIMAL(19,0))
         |            * CAST($wc AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS svw
         |        FROM shifted) t1) t2) t3) t4""".stripMargin
    s"""WITH daily AS (
       |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(sum(CASE WHEN event_type = '$GrX' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = '$GrY' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS y
       |  FROM events WHERE event_type IN ('$GrX', '$GrY')
       |  GROUP BY 1),
       |lagged AS (
       |  SELECT x, y,
       |    lag(x, 1) OVER (ORDER BY d) AS xl,
       |    lag(y, 1) OVER (ORDER BY d) AS yl
       |  FROM daily),
       |shifted AS (SELECT * FROM lagged WHERE xl IS NOT NULL)
       |${legSql(s"$GrX->$GrY", "y", "yl", "xl")}
       |UNION ALL
       |${legSql(s"$GrY->$GrX", "x", "xl", "yl")}
       |ORDER BY direction""".stripMargin
  }

  // ---- evt_pacf_table --------------------------------------------------------
  private val PacfLags = 7

  // Durbin-Levinson stage k: φ_kk = (ρ_k − Σ_{j<k} φ_{k−1,j}·ρ_{k−j})
  // / (1 − Σ_{j<k} φ_{k−1,j}·ρ_j), then φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}.
  // Columns named p{k}_{j}; ρ as raw (unfloored) doubles r1..rK so
  // the recursion sees identical inputs in both engines.
  private def dlStage(k: Int): Seq[String] =
    if (k == 1) Seq("r1 AS p1_1")
    else {
      val num = s"(r$k - (${(1 until k)
        .map(j => s"p${k - 1}_$j * r${k - j}").mkString(" + ")}))"
      val den = s"(1 - (${(1 until k)
        .map(j => s"p${k - 1}_$j * r$j").mkString(" + ")}))"
      val pkk = s"$num / nullif($den, 0)"
      (1 until k).map(j =>
        s"p${k - 1}_$j - ($pkk) * p${k - 1}_${k - j} AS p${k}_$j") :+
        s"$pkk AS p${k}_$k"
    }

  private[graft] def pacfOn(events: DataFrame): DataFrame = {
    val rhoCols = (1 to PacfLags).map(k =>
      s"${Composite45.rhoF(k)} AS r$k")
    var df = Composite45.lagMoments(events, PacfLags)
      .selectExpr("event_type" +: "nd" +: rhoCols: _*)
    for (k <- 1 to PacfLags) df = df.selectExpr("*" +: dlStage(k): _*)
    val stackArgs = (1 to PacfLags).map(k =>
      s"CAST($k AS BIGINT), floor((p${k}_$k)*1e6 + 0.5)/1e6")
      .mkString(", ")
    df.selectExpr("event_type", "nd AS n_days",
        s"stack($PacfLags, $stackArgs) AS (lag, pacf)")
      .orderBy("event_type", "lag")
  }

  private def pacfTable(s: SparkSession, dir: String): DataFrame =
    pacfOn(loadEvents(s, dir))

  private val pacfOracle = {
    val moments = (1 to PacfLags).flatMap(k => Seq(
      s"CAST(count(l$k) AS BIGINT) AS n$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN y END) AS BIGINT) AS sa$k",
      s"CAST(sum(l$k) AS BIGINT) AS sb$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN y*y END) AS BIGINT) AS saa$k",
      s"CAST(sum(l$k*l$k) AS BIGINT) AS sbb$k",
      s"CAST(sum(y*l$k) AS BIGINT) AS sab$k")).mkString(",\n    ")
    val lagCols = (1 to PacfLags).map(k =>
      s"lag(y, $k) OVER (PARTITION BY event_type ORDER BY d) AS l$k")
      .mkString(",\n    ")
    val rhoCols = (1 to PacfLags).map(k =>
      s"${Composite45.rhoF(k)} AS r$k").mkString(",\n    ")
    val stages = (1 to PacfLags).map(k =>
      s"s$k AS (SELECT *, ${dlStage(k).mkString(", ")} FROM s${k - 1})")
      .mkString(",\n")
    val branches = (1 to PacfLags).map(k =>
      s"""SELECT event_type, nd AS n_days, CAST($k AS BIGINT) AS lag,
         |  floor((p${k}_$k)*1e6 + 0.5)/1e6 AS pacf
         |FROM s$PacfLags""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, y,
       |    $lagCols
       |  FROM daily),
       |g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
       |    $moments
       |  FROM lagged GROUP BY 1),
       |s0 AS (
       |  SELECT event_type, nd,
       |    $rhoCols
       |  FROM g),
       |$stages
       |$branches
       |ORDER BY event_type, lag""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_granger_lite" -> (grangerLite _),
    "evt_pacf_table" -> (pacfTable _)
  )

  val oracle: Map[String, String] = Map(
    "evt_granger_lite" -> grangerOracle,
    "evt_pacf_table" -> pacfOracle
  )
}
