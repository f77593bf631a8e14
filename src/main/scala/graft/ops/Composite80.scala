package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.89 (round-17 batch 7) — `agg_lorenz_curve`: the ten
  * Lorenz points (cumulative population share → cumulative value
  * share) of per-customer order spend — the CURVE behind `agg_gini`'s
  * single number (which deciles carry the inequality) and the
  * "top-X% of customers hold Y% of revenue" dashboard staple.
  *
  * Order statistics by counting on the (spend-cents, count) grid:
  * cumulative counts AND cumulative spend ride one multi-weight
  * [[graft.util.DistRank.globalPrefixSums]] pass; the poorest
  * m = ⌈k·n/10⌉ customers' total = spend-below(x*) + (m −
  * count-below(x*))·x* where x* is the value at rank m (min x with
  * cum ≥ m) — the boundary value splits exactly, every quantity an
  * exact BIGINT/DECIMAL cent sum until the two share divisions.
  * No global sort anywhere (`agg_gini` itself rides a per-nation
  * window — bounded per nation; this row is the GLOBAL curve, which
  * is exactly where a bare rank window would funnel all customers
  * through one task).
  */
object Composite80 {

  private[graft] def lorenzOn(spend: DataFrame): DataFrame = {
    // spend: (id, cents BIGINT ≥ 0)
    val v = spend.groupBy(col("cents").as("xc"))
      .agg(count(lit(1)).as("cnt"))
    // r19: the grand totals (n, tv) ride the prefix-sum pass as
    // constant columns (DistRank totals — exact BIGINT/DECIMAL sums,
    // bit-identical to the standalone aggregate they replace), so the
    // tot job + crossJoin broadcast are gone (guide §1.2).
    val pre = graft.util.DistRank.globalPrefixSumsWithTotals(v,
        Seq("bc" -> col("cnt"),
          "bv" -> expr("CAST(xc AS DECIMAL(38,0)) * cnt")), col("xc"),
        totals = Seq("n" -> col("cnt"),
          "tv" -> expr("CAST(xc AS DECIMAL(38,0)) * cnt")))
      .select(col("xc"), col("bc"), col("bv"),
        (col("bc") + col("cnt")).as("c"), col("n"), col("tv"))
      .localCheckpoint() // rank pick + the boundary-row fetch
    val ks = spend.sparkSession.range(1, 11).select(col("id").as("k"))
    val picked = pre.crossJoin(broadcast(ks))
      .filter(expr("c >= (k*n + 9) div 10"))
      .groupBy(col("k")).agg(min(col("xc")).as("q"))
    picked.join(pre, col("q") === col("xc"))
      .selectExpr("CAST(k AS BIGINT) AS decile",
        "(k*n + 9) div 10 AS n_cum",
        "floor((CAST((k*n + 9) div 10 AS DOUBLE)/CAST(n AS DOUBLE))*1e6 + 0.5)/1e6 AS pop_share",
        """floor((CAST(bv + ((k*n + 9) div 10 - bc) * q AS DOUBLE)
          |  / nullif(CAST(tv AS DOUBLE), 0))*1e6 + 0.5)/1e6 AS value_share""".stripMargin)
      .orderBy("decile")
  }

  private def lorenz(s: SparkSession, dir: String): DataFrame = {
    val spend = load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint").as("cents"))
    lorenzOn(spend)
  }

  private val lorenzOracle =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |v AS (SELECT cents AS xc, CAST(count(*) AS BIGINT) AS cnt
      |  FROM spend GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |  sum(CAST(xc AS DECIMAL(38,0)) * cnt) AS tv FROM v),
      |pre AS (
      |  SELECT xc,
      |    CAST(sum(cnt) OVER w AS BIGINT) - cnt AS bc,
      |    sum(CAST(xc AS DECIMAL(38,0)) * cnt) OVER w
      |      - CAST(xc AS DECIMAL(38,0)) * cnt AS bv,
      |    CAST(sum(cnt) OVER w AS BIGINT) AS c
      |  FROM v
      |  WINDOW w AS (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ks AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS k),
      |picked AS (
      |  SELECT k, min(xc) AS q FROM pre CROSS JOIN ks CROSS JOIN tot
      |  WHERE c >= (k*n + 9) // 10 GROUP BY k)
      |SELECT CAST(k AS BIGINT) AS decile,
      |  (k*n + 9) // 10 AS n_cum,
      |  floor((CAST((k*n + 9) // 10 AS DOUBLE)/CAST(n AS DOUBLE))*1e6 + 0.5)/1e6 AS pop_share,
      |  floor((CAST(bv + ((k*n + 9) // 10 - bc) * q AS DOUBLE)
      |    / nullif(CAST(tv AS DOUBLE), 0))*1e6 + 0.5)/1e6 AS value_share
      |FROM picked JOIN pre ON q = xc CROSS JOIN tot
      |ORDER BY decile""".stripMargin

  // ---- registration ---------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_lorenz_curve" -> (lorenz _)
  )

  val oracle: Map[String, String] = Map(
    "agg_lorenz_curve" -> lorenzOracle
  )
}
