package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.Tables

/** SURVEY.md §2.13 — declarative SQL surface: subquery forms, CTE
  * reuse, recursion, lateral correlation. These run through
  * `spark.sql` over temp views so the full parser → analyzer →
  * decorrelation path is exercised (Catalyst rewrites every
  * correlated form below into joins — EXISTS → left-semi, scalar
  * subquery → left-outer aggregate join, lateral → decorrelated
  * join — so at scale they inherit the same shuffle/broadcast
  * machinery as the hand-built §2.3 plans; nothing is re-executed
  * per outer row).
  *
  * Views are registered idempotently per call from the given sfDir;
  * queries stay pure functions of (session, dir).
  */
object SqlSurface {

  private def views(s: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "lineitem", "nation", "region")
      .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  private def q(sql: String)(s: SparkSession, dir: String): DataFrame = {
    views(s, dir); s.sql(sql)
  }

  /** Correlated EXISTS + NOT EXISTS in one predicate: customers with
    * at least one urgent order but no fulfilled ('F') order. */
  private val existsSql =
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |           AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Correlated scalar aggregate subquery in the projection: each
    * order with its priciest line item (null when no line items). */
  private val scalarSubSql =
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT max(l_extendedprice) FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey) AS max_item
      |FROM orders o
      |ORDER BY o_orderkey""".stripMargin

  /** One CTE referenced twice: per-customer order totals, then each
    | customer's share of their nation's total (CTE self-join). */
  private val cteSql =
    """WITH totals AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS spend
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey, c_nationkey),
      |nat AS (
      |  SELECT c_nationkey, CAST(sum(CAST(spend AS DECIMAL(20,2))) AS DOUBLE) AS nspend
      |  FROM totals GROUP BY c_nationkey)
      |SELECT t.c_custkey, t.spend, round(t.spend / n.nspend, 6) AS share
      |FROM totals t JOIN nat n ON t.c_nationkey = n.c_nationkey
      |ORDER BY t.c_custkey""".stripMargin

  /** WITH RECURSIVE: integer sequence 0..24 generated recursively,
    * joined back to the nation dim (recursion feeding a join). */
  private val recursiveSql =
    """WITH RECURSIVE seq(n) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT n + 1 FROM seq WHERE n < 24)
      |SELECT s.n, nt.n_name
      |FROM seq s JOIN nation nt ON s.n = nt.n_nationkey
      |ORDER BY s.n""".stripMargin

  /** LATERAL correlated subquery in FROM: per-customer order count
    * and max price computed by a lateral aggregate. */
  private val lateralSql =
    """SELECT c.c_custkey, o.n_orders, o.max_price
      |FROM customer c,
      |LATERAL (SELECT count(*) AS n_orders, max(o_totalprice) AS max_price
      |         FROM orders WHERE o_custkey = c.c_custkey) o
      |WHERE o.n_orders > 0
      |ORDER BY c.c_custkey""".stripMargin

  /** SQL PIVOT syntax (the parser path; the DataFrame `.pivot` twin
    * is `agg_pivot`). Sums cast to BIGINT per SURVEY §1.5 r5. */
  private val pivotSql =
    """SELECT * FROM (
      |  SELECT l_linestatus, l_returnflag, CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem)
      |PIVOT (CAST(sum(q) AS BIGINT) FOR l_returnflag IN ('A' AS A, 'N' AS N, 'R' AS R))
      |ORDER BY l_linestatus""".stripMargin

  /** SQL UNPIVOT syntax (wide → long; the DataFrame twin is
    * `proj_unpivot`). Ordered by the full output tuple. */
  private val unpivotSql =
    """SELECT l_orderkey, metric, val FROM (
      |  SELECT l_orderkey, CAST(l_quantity AS DOUBLE) AS quantity,
      |    CAST(l_extendedprice AS DOUBLE) AS price
      |  FROM lineitem)
      |UNPIVOT (val FOR metric IN (quantity, price))
      |ORDER BY l_orderkey, metric, val""".stripMargin

  /** Join-strategy hint via SQL comment syntax: the dimension is
    * forced broadcast (PlanSpec asserts the executed plan). */
  private val hintSql =
    """SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS cnt
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** DISTRIBUTE BY + SORT BY (partition-control SQL): rows hashed to
    * partitions by flag, sorted within each — the manual form of the
    * clustered-write shape. The outer ORDER BY restores the total
    * order the hash compare needs. */
  private val clusterBySql =
    """SELECT l_returnflag, l_orderkey, l_quantity FROM (
      |  SELECT l_returnflag, l_orderkey, l_quantity
      |  FROM lineitem
      |  DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_orderkey)
      |ORDER BY l_returnflag, l_orderkey, l_quantity""".stripMargin

  /** NOT IN over a subquery — the null-aware anti-join path (NOT IN
    * must yield no rows if the subquery EVER produces NULL, so
    * Catalyst plans a null-aware anti join, not the plain left-anti
    * of NOT EXISTS). */
  private val notInSql =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey NOT IN (
      |  SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      |ORDER BY o_orderkey, o_custkey""".stripMargin

  /** Star-projection subtraction (`SELECT * EXCEPT (...)`, Spark's
    * wide-table idiom for "all but the heavy/volatile columns") —
    * column pruning applies to the RESULT list, so the scan reads
    * only the surviving columns exactly as an explicit projection
    * would. The oracle spells DuckDB's `EXCLUDE` synonym. */
  private[graft] val starExceptSql =
    """SELECT * EXCEPT (o_orderstatus, o_orderpriority)
      |FROM orders WHERE o_custkey % 1000 = 0
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_star_except" -> (q(starExceptSql) _),
    "sql_exists_subquery" -> (q(existsSql) _),
    "sql_not_in_null_aware" -> (q(notInSql) _),
    "sql_scalar_subquery" -> (q(scalarSubSql) _),
    "sql_cte_reuse" -> (q(cteSql) _),
    "sql_recursive_cte" -> (q(recursiveSql) _),
    "sql_lateral_join" -> (q(lateralSql) _),
    "sql_pivot" -> (q(pivotSql) _),
    "sql_unpivot" -> (q(unpivotSql) _),
    "sql_join_hint" -> (q(hintSql) _),
    "sql_cluster_by" -> (q(clusterBySql) _)
  )

  // The ANSI forms (EXISTS/scalar-subquery/CTE/recursive/NOT IN) run
  // as IDENTICAL text in DuckDB; the Spark-specific syntax rows
  // (PIVOT column list, UNPIVOT, /*+ hints */, DISTRIBUTE BY) are
  // oracled by ANSI rewrites — never paste Spark-only syntax into a
  // DuckDB oracle. count(*) returns BIGINT in both engines.
  val oracle: Map[String, String] = Map(
    "sql_star_except" ->
      """SELECT * EXCLUDE (o_orderstatus, o_orderpriority)
        |FROM orders WHERE o_custkey % 1000 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "sql_exists_subquery" -> existsSql,
    "sql_scalar_subquery" -> scalarSubSql,
    "sql_cte_reuse" -> cteSql,
    "sql_recursive_cte" -> recursiveSql,
    "sql_lateral_join" ->
      lateralSql.replace("count(*) AS n_orders",
        "CAST(count(*) AS BIGINT) AS n_orders"),
    "sql_not_in_null_aware" -> notInSql,

    // Spark-specific syntax (PIVOT column list, hints, DISTRIBUTE BY)
    // oracled by their ANSI equivalents.
    "sql_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS A,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS N,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "sql_unpivot" ->
      """SELECT l_orderkey, 'quantity' AS metric, CAST(l_quantity AS DOUBLE) AS val
        |FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, 'price', CAST(l_extendedprice AS DOUBLE)
        |FROM lineitem
        |ORDER BY l_orderkey, metric, val""".stripMargin,

    "sql_join_hint" ->
      """SELECT n_name, count(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "sql_cluster_by" ->
      """SELECT l_returnflag, l_orderkey, l_quantity FROM lineitem
        |ORDER BY l_returnflag, l_orderkey, l_quantity""".stripMargin
  )
}
