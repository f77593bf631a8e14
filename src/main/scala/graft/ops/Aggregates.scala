package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.4 — aggregation operators.
  *
  * Scale notes: every aggregate here is a two-phase HashAggregate
  * (map-side partial -> shuffle on group keys -> final). Group-key
  * cardinality is tiny relative to input (flags, status, keys), so the
  * shuffle moves only partial states — the pattern that survives 100 TB.
  * Money aggregates accumulate in exact DECIMAL (order-independent)
  * and surface as DOUBLE (SURVEY §1.5 rule 2).
  */
object Aggregates {

  /** TPC-H Q1 shape: the flagship end-to-end slice (SURVEY §7.2). */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = load(spark, dir, "lineitem")
    val discFactor = (lit(1) - money($"l_discount")).cast("decimal(8,4)")
    val chargeFactor =
      ((lit(1) - money($"l_discount")) * (lit(1) + money($"l_tax")))
        .cast("decimal(8,4)")
    l.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        asD(sum(money($"l_extendedprice"))).as("sum_base_price"),
        asD(sum(money($"l_extendedprice") * discFactor)).as("sum_disc_price"),
        asD(sum(money($"l_extendedprice") * chargeFactor)).as("sum_charge"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (asD(sum(money($"l_extendedprice"))) / count(lit(1))).as("avg_price"),
        (asD(sum(money($"l_discount"))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> (aggPricingSummary _)
  )

  val oracle: Map[String, String] = Map(
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(1 - CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST((1 - CAST(l_discount AS DECIMAL(15,2))) * (1 + CAST(l_tax AS DECIMAL(15,2))) AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
