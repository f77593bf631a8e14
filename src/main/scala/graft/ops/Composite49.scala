package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.65 (round-24 batch 7) — variance-homogeneity testing
  * and event-time disorder:
  *
  *  - [[levene]]: Brown-Forsythe/Levene W across the five order
  *    priorities — one-way ANOVA on absolute deviations from each
  *    group's PICKED median. The precondition test for
  *    `agg_anova_f` (classic ANOVA assumes equal variances; Levene
  *    checks exactly that, and the median-based Brown-Forsythe form
  *    is the robust variant in every stats package).
  *
  *  - [[outOfOrderAudit]]: event-time disorder per event type —
  *    adjacent pairs in ARRIVAL order (event_id) whose timestamps
  *    run backward, their rate, and the worst backward jump in µs.
  *    This is the number that TUNES a watermark
  *    (`withWatermark(delay)` must exceed the observed backward
  *    jump or `evt_watermark_late`-style drops begin); the corpus
  *    reads zero disorder, which is itself the audit's finding —
  *    the planted spec injects disorder to prove the detector.
  *
  * Scale shape: per-group medians via the 2·cum ≥ n picked-median
  * discipline over the (group, cents) VALUE-COUNT relation (the
  * runs-test shape — the window sorts distinct values, never the
  * fact table), broadcast back (5 rows); then ONE
  * conditional-aggregation pass with fixed-order group columns (the
  * agg_anova_f discipline).
  *
  * Determinism: prices become exact cents, medians and deviations
  * are exact BIGINTs; Σz per group stays in BIGINT (≤ 2^53, cast to
  * double exactly on both engines) while Σz² goes through
  * DECIMAL(38,0) (§1.5 rule 9) with the VARCHAR oracle route; W
  * assembles once in fixed left-to-right text, nullif guards the
  * degenerate, verdict after the 6-dp floor.
  */
object Composite49 {

  private val LvGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private val lvAggs = LvGroups.zipWithIndex.flatMap { case (p, i) =>
    Seq(
      Composite3.StatAgg(s"n$i",
        s"CAST(sum(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END) AS DOUBLE)",
        s"CAST(sum(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END) AS DOUBLE)"),
      Composite3.StatAgg(s"a$i",
        s"CAST(sum(CASE WHEN o_orderpriority = '$p' THEN z END) AS DOUBLE)",
        s"CAST(sum(CASE WHEN o_orderpriority = '$p' THEN z END) AS DOUBLE)"),
      Composite3.sumAgg(
        s"CASE WHEN o_orderpriority = '$p' THEN CAST(z*z AS DECIMAL(38,0)) END",
        s"b$i"))
  }

  private val lvN = (0 until 5).map(i => s"n$i").mkString(" + ")
  private val lvS1 = (0 until 5).map(i => s"a$i").mkString(" + ")
  private val lvSsw = (0 until 5).map(i => s"(b$i - (a$i/n$i)*a$i)")
    .mkString(" + ")
  private val lvSsb = s"(${(0 until 5).map(i => s"(a$i/n$i)*a$i").mkString(" + ")})" +
    s" - (($lvS1)/($lvN))*($lvS1)"
  private val lvW =
    s"floor(((($lvSsb)/4) / nullif(($lvSsw)/(($lvN) - 5), 0))*1e6 + 0.5)/1e6"

  private val lvOut = Seq(
    s"CAST($lvN AS BIGINT) AS n",
    s"$lvW AS w_stat",
    s"($lvW > 2.3719) AS reject_equal_variance_5pct")

  private[graft] def leveneOn(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_orderpriority"),
      (money(col("o_totalprice")) * 100).cast("bigint").as("c"))
    val cnts = o.groupBy(col("o_orderpriority"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy(col("o_orderpriority")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = cnts
      .select(col("o_orderpriority"), col("c"),
        sum(col("cnt")).over(wc).as("cum"))
      .join(broadcast(cnts.groupBy(col("o_orderpriority"))
        .agg(sum(col("cnt")).as("ng"))), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(min(when(col("cum") * 2 >= col("ng"), col("c"))).as("med"))
    o.join(broadcast(med), "o_orderpriority")
      .select(col("o_orderpriority"), abs(col("c") - col("med")).as("z"))
      .agg(expr(lvAggs.head.spark).as(lvAggs.head.alias),
        lvAggs.tail.map(a => expr(a.spark).as(a.alias)): _*)
      .selectExpr(lvOut: _*)
  }

  private def levene(s: SparkSession, dir: String): DataFrame =
    leveneOn(load(s, dir, "orders"))

  private def leveneOracle: String =
    s"""WITH o AS (
       |  SELECT o_orderpriority,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT) AS c
       |  FROM orders),
       |cnts AS (
       |  SELECT o_orderpriority, c, CAST(count(*) AS BIGINT) AS cnt
       |  FROM o GROUP BY 1, 2),
       |cum AS (
       |  SELECT o_orderpriority, c,
       |    CAST(sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT)
       |      AS ng
       |  FROM cnts),
       |med AS (
       |  SELECT o_orderpriority,
       |    CAST(min(CASE WHEN cum * 2 >= ng THEN c END) AS BIGINT) AS med
       |  FROM cum GROUP BY 1),
       |zs AS (
       |  SELECT o.o_orderpriority, abs(c - med) AS z
       |  FROM o JOIN med USING (o_orderpriority)),
       |g AS (
       |  SELECT
       |    ${lvAggs.map(a => s"${a.oracle} AS ${a.alias}").mkString(",\n    ")}
       |  FROM zs)
       |SELECT
       |  ${lvOut.mkString(",\n  ")}
       |FROM g""".stripMargin

  // ---- dq_out_of_order_audit -------------------------------------------
  // One lag window over (type, event_id) on the epoch-µs projection;
  // all outputs exact integers except the floor-6 rate. coalesce
  // keeps the worst-jump column total (0, not NULL) for in-order
  // types, so downstream watermark math needs no null handling.
  private[graft] def outOfOrderAuditOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    events
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
      .select(col("event_type"),
        (col("tsu") - lag(col("tsu"), 1).over(w)).as("d"))
      .groupBy(col("event_type"))
      .agg(count(col("d")).as("n_pairs"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_backward"),
        coalesce(max(when(col("d") < 0, -col("d"))), lit(0L))
          .as("max_backward_us"))
      .selectExpr("event_type", "n_pairs", "n_backward", "max_backward_us",
        """floor((CAST(n_backward AS DOUBLE) / nullif(n_pairs, 0))*1e6
          | + 0.5)/1e6 AS backward_rate""".stripMargin)
      .orderBy("event_type")
  }

  private def outOfOrderAudit(s: SparkSession, dir: String): DataFrame =
    outOfOrderAuditOn(loadEvents(s, dir))

  private val outOfOrderAuditOracle =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
      |  FROM events),
      |lg AS (
      |  SELECT event_type,
      |    tsu - lag(tsu, 1) OVER (PARTITION BY event_type
      |      ORDER BY event_id) AS d
      |  FROM e),
      |g AS (
      |  SELECT event_type, CAST(count(d) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_backward,
      |    CAST(coalesce(max(CASE WHEN d < 0 THEN -d END), 0) AS BIGINT)
      |      AS max_backward_us
      |  FROM lg GROUP BY 1)
      |SELECT event_type, n_pairs, n_backward, max_backward_us,
      |  floor((CAST(n_backward AS DOUBLE) / nullif(n_pairs, 0))*1e6
      |   + 0.5)/1e6 AS backward_rate
      |FROM g ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_levene_test" -> (levene _),
    "dq_out_of_order_audit" -> (outOfOrderAudit _)
  )

  val oracle: Map[String, String] = Map(
    "agg_levene_test" -> leveneOracle,
    "dq_out_of_order_audit" -> outOfOrderAuditOracle
  )
}
