package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2.89 (round-17 batch 8) — `dq_benford_second_digit`:
  * the second-significant-digit Benford screen over order totals,
  * the standard forensic follow-up to `agg_benford` (first digits
  * survive naive fabrication; invented numbers betray themselves in
  * the SECOND digit — Nigrini's two-digit battery). Expected shares
  * P(d) = Σ_{k=1..9} log10(1 + 1/(10k + d)) are PINNED as double
  * literals computed offline (no cross-engine libm call — the
  * agg_benford LN10 discipline, extended: here the whole table is
  * pinned because the sum has no closed per-row form). Digit
  * extraction reads position 2 of the DECIMAL(15,2) string (both
  * engines format it identically); totals < 10 lack a second integer
  * digit (position 2 is the decimal point) and are excluded,
  * documented — o_totalprice ≥ 10 for every row of every SF, so the
  * filter is a no-op guard. One hash aggregate over a projection;
  * the share window runs over the 10-row digit relation (free).
  */
object Composite81 {

  /** Σ_{k=1..9} log10(1 + 1/(10k + d)), d = 0..9, 17 significant
    * digits, E0-pinned (§1.5: bare decimals parse as DECIMAL). */
  private val Exp2 = IndexedSeq(
    "0.11967926859688073E0", "0.1138901034075564E0",
    "0.10882149900550823E0", "0.10432956023095939E0",
    "0.10030820226757937E0", "0.09667723580232243E0",
    "0.09337473578303615E0", "0.09035198926960332E0",
    "0.08757005357886138E0", "0.08499735205769224E0")

  private val expCase = Exp2.zipWithIndex
    .map { case (p, d) => s"WHEN $d THEN $p" }
    .mkString("CASE digit ", " ", " END")

  private def body(str: String) =
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS $str), 2, 1) AS INT) AS digit
       |  FROM orders
       |  WHERE CAST(o_totalprice AS DECIMAL(15,2)) >= 10),
       |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit)
       |SELECT digit, n,
       |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6) AS share,
       |  round($expCase, 6) AS benford2,
       |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)
       |    - $expCase, 6) AS deviation
       |FROM c
       |ORDER BY digit""".stripMargin

  /** Generic seam: runs the screen over whatever `orders` relation is
    * bound (planted inputs in Round57Spec exercise the totals-<10
    * exclusion and a known distribution). */
  private[graft] def benford2On(s: SparkSession, orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders")
    s.sql(body("STRING"))
  }

  private def benford2(s: SparkSession, dir: String): DataFrame =
    benford2On(s, graft.util.Tables.load(s, dir, "orders"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_benford_second_digit" -> (benford2 _)
  )

  val oracle: Map[String, String] = Map(
    "dq_benford_second_digit" -> body("VARCHAR")
  )
}
