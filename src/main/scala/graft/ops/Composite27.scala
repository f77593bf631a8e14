package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SURVEY.md §2.44 (round-8 additions) — the pipeline-audit pack a
  * production data platform runs before anything else trains on the
  * corpus. Three operators, all exact and oracle-checked:
  *
  *  - [[constraintCheck]]: declared-constraint violations (FK orphans,
  *    domain bounds, temporal ordering) as one (check_name, count)
  *    relation. ONE scan per audited table: the fact acquires every
  *    dimension key through left joins in a single pass and all
  *    per-constraint counts fall out of one conditional aggregate —
  *    at 100 TB that is 3 co-partitioned joins + a 10-row result, vs
  *    the naive one-anti-join-per-constraint plan's 7 fact rescans.
  *
  *  - [[uniquenessAudit]]: candidate-key cardinality audit per entity
  *    (n_rows, n_keys, n_dup_rows). Each entity is one
  *    count+count_distinct aggregate; the known non-unique
  *    lineitem (l_orderkey, l_linenumber) tuple (see
  *    [[graft.util.Tables.lineitemCols]]) keeps the op honest with a
  *    non-zero row.
  *
  *  - [[freshness]]: per-event-type staleness anchored at the CORPUS
  *    max timestamp (not wall-clock — deterministic across engines
  *    and reruns): last event, integer-hour lag behind the freshest
  *    type, and trailing-7-day volume. The 1-row global max rides a
  *    broadcast cross join into the per-type aggregate (the pagerank
  *    `nn` discipline — no standalone collect).
  */
object Composite27 {

  private def constraintCheck(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(load(s, dir, "part").select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left")
      .join(load(s, dir, "supplier").select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left")
    def viol(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val liRow = li.agg(
      viol(col("o_orderkey").isNull).as("fk_lineitem_orderkey"),
      viol(col("p_partkey").isNull).as("fk_lineitem_partkey"),
      viol(col("s_suppkey").isNull).as("fk_lineitem_suppkey"),
      viol(col("l_quantity") < 1 || col("l_quantity") > 50)
        .as("chk_quantity_range"),
      viol(col("l_discount") < 0 || col("l_discount") > 0.1)
        .as("chk_discount_range"),
      viol(col("l_tax") < 0 || col("l_tax") > 0.08).as("chk_tax_range"),
      viol(col("o_orderdate").isNotNull &&
        col("l_shipdate") < col("o_orderdate")).as("chk_ship_after_order"))
    val ordRow = load(s, dir, "orders")
      .join(load(s, dir, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(
        viol(col("c_custkey").isNull).as("fk_orders_custkey"),
        viol(col("o_totalprice") <= 0).as("chk_price_positive"))
    val custRow = load(s, dir, "customer")
      .join(broadcast(load(s, dir, "nation").select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left")
      .agg(viol(col("n_nationkey").isNull).as("fk_customer_nationkey"))
    def unpivot(row: DataFrame): DataFrame = {
      val cols = row.columns
      val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
      row.select(expr(
        s"stack(${cols.length}, $stackArgs) AS (check_name, n_violations)"))
    }
    unpivot(liRow).unionAll(unpivot(ordRow)).unionAll(unpivot(custRow))
      .orderBy("check_name")
  }

  private val constraintCheckOracle =
    """WITH li AS (
      |  SELECT l.*, o.o_orderkey AS ok, o.o_orderdate AS od,
      |         p.p_partkey AS pk, s.s_suppkey AS sk
      |  FROM lineitem l
      |  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |ord AS (
      |  SELECT o.*, c.c_custkey AS ck FROM orders o
      |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
      |cust AS (
      |  SELECT c.*, n.n_nationkey AS nk FROM customer c
      |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |rows AS (
      |  SELECT 'fk_lineitem_orderkey' AS check_name,
      |    sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS n_violations FROM li
      |  UNION ALL SELECT 'fk_lineitem_partkey',
      |    sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) FROM li
      |  UNION ALL SELECT 'fk_lineitem_suppkey',
      |    sum(CASE WHEN sk IS NULL THEN 1 ELSE 0 END) FROM li
      |  UNION ALL SELECT 'chk_quantity_range',
      |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) FROM li
      |  UNION ALL SELECT 'chk_discount_range',
      |    sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) FROM li
      |  UNION ALL SELECT 'chk_tax_range',
      |    sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) FROM li
      |  UNION ALL SELECT 'chk_ship_after_order',
      |    sum(CASE WHEN od IS NOT NULL AND l_shipdate < od THEN 1 ELSE 0 END) FROM li
      |  UNION ALL SELECT 'fk_orders_custkey',
      |    sum(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) FROM ord
      |  UNION ALL SELECT 'chk_price_positive',
      |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM ord
      |  UNION ALL SELECT 'fk_customer_nationkey',
      |    sum(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) FROM cust)
      |SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations
      |FROM rows ORDER BY check_name""".stripMargin

  private def uniquenessAudit(s: SparkSession, dir: String): DataFrame = {
    def simple(table: String, key: String): DataFrame =
      load(s, dir, table).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(key)).as("n_keys"))
        .select(lit(s"$table.$key").as("entity"), col("n_rows"),
          col("n_keys"), (col("n_rows") - col("n_keys")).as("n_dup_rows"))
    val simpleKeys = Seq(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    // the known-non-unique composite key (Tables.lineitemCols note):
    // a real audit must surface the violation, not assume it away
    val liKey = load(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_keys"))
      .select(lit("lineitem.l_orderkey+l_linenumber").as("entity"),
        col("n_rows"), col("n_keys"),
        (col("n_rows") - col("n_keys")).as("n_dup_rows"))
    (simpleKeys.map { case (t, k) => simple(t, k) } :+ liKey)
      .reduce(_.unionAll(_))
      .orderBy("entity")
  }

  private val uniquenessAuditOracle = {
    val simpleKeys = Seq(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    val parts = simpleKeys.map { case (t, k) =>
      s"""SELECT '$t.$k' AS entity, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT $k) AS BIGINT) AS n_keys,
         |  CAST(count(*) - count(DISTINCT $k) AS BIGINT) AS n_dup_rows
         |FROM $t""".stripMargin
    } :+
      """SELECT 'lineitem.l_orderkey+l_linenumber', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |FROM lineitem""".stripMargin
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY entity")
  }

  private def freshness(s: SparkSession, dir: String): DataFrame = {
    val e = loadEvents(s, dir)
    val g = e.agg(max(col("ts")).as("gmax"))
    e.crossJoin(broadcast(g))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        sum(when(col("ts") >= col("gmax") - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).as("n_last_7d"),
        first(col("gmax")).as("gmax"))
      .select(col("event_type"), col("n_events"), col("last_ts"),
        // µs-epoch discipline (matches sessionStats/transitionTime/
        // churnRisk): whole-second truncation can flip floor(diff/3600)
        // across an hour boundary when sub-second parts straddle it.
        floor((unix_micros(col("gmax")) - unix_micros(col("last_ts")))
          / 3600000000.0).cast("long").as("lag_hours"),
        col("n_last_7d"))
      .orderBy("event_type")
  }

  private val freshnessOracle =
    """WITH g AS (SELECT max(ts) AS gmax FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  max(ts) AS last_ts,
      |  CAST(floor((epoch_us(g.gmax) - epoch_us(max(ts))) / 3600000000.0)
      |    AS BIGINT) AS lag_hours,
      |  CAST(sum(CASE WHEN ts >= g.gmax - INTERVAL 7 DAY THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_last_7d
      |FROM events CROSS JOIN g
      |GROUP BY event_type, g.gmax
      |ORDER BY event_type""".stripMargin

  // ---- dq_generation_drift -----------------------------------------
  // Corpus-version drift check: per-source PSI contributions of the
  // doc-length distribution between two generations (even vs odd
  // doc_ids — the llm_dedup_incremental split). Lengths bucket into 9
  // fixed 64-char bands (scale-independent bounds; the cap band
  // absorbs outliers), counts are Laplace-smoothed (+0.5 per cell, so
  // empty cells stay finite and deterministic), and the row surfaces
  // the PER-BUCKET PSI term (pb−pa)·ln(pb/pa) rather than their sum:
  // each term is ONE double expression over exact integers — the
  // growth_decompose cross-engine float discipline — whereas a 9-term
  // double SUM would be summation-order-sensitive between engines.
  // Per-bucket terms also localize WHERE the distribution moved,
  // which is the diagnostic a corpus owner actually wants.
  private def generationDrift(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
      .select(col("source"), (col("doc_id") % 2 === 0).as("ga"),
        expr("least(n_chars div 64, 8)").as("b"))
    val counts = d.groupBy(col("source"), col("b"))
      .agg(sum(when(col("ga"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("ga"), 1L).otherwise(0L)).as("cb"))
    val spine = d.select(col("source")).distinct()
      .crossJoin(s.range(9).select(col("id").as("b")))
    val tot = d.groupBy(col("source"))
      .agg(sum(when(col("ga"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("ga"), 1L).otherwise(0L)).as("nb"))
    val pa = (col("ca") + 0.5) / (col("na") + 4.5)
    val pb = (col("cb") + 0.5) / (col("nb") + 4.5)
    spine.join(counts, Seq("source", "b"), "left")
      .na.fill(0L, Seq("ca", "cb"))
      .join(broadcast(tot), "source")
      .select(col("source"), col("b"), col("ca"), col("cb"),
        round((pb - pa) * log(pb / pa), 6).as("psi_term"))
      .orderBy("source", "b")
  }

  private val generationDriftOracle =
    """WITH d AS (
      |  SELECT source, doc_id % 2 = 0 AS ga,
      |    least(n_chars // 64, 8) AS b
      |  FROM documents),
      |counts AS (
      |  SELECT source, b,
      |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM d GROUP BY 1, 2),
      |spine AS (
      |  SELECT source, CAST(r.range AS BIGINT) AS b
      |  FROM (SELECT DISTINCT source FROM d) CROSS JOIN range(9) r),
      |tot AS (
      |  SELECT source,
      |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM d GROUP BY 1)
      |SELECT spine.source, spine.b,
      |  coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb,
      |  round(((coalesce(cb, 0) + 0.5) / (nb + 4.5)
      |       - (coalesce(ca, 0) + 0.5) / (na + 4.5))
      |    * ln(((coalesce(cb, 0) + 0.5) / (nb + 4.5))
      |       / ((coalesce(ca, 0) + 0.5) / (na + 4.5))), 6) AS psi_term
      |FROM spine
      |LEFT JOIN counts ON spine.source = counts.source AND spine.b = counts.b
      |JOIN tot ON spine.source = tot.source
      |ORDER BY spine.source, spine.b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_generation_drift" -> (generationDrift _),
    "dq_constraint_check" -> (constraintCheck _),
    "dq_uniqueness_audit" -> (uniquenessAudit _),
    "dq_freshness" -> (freshness _)
  )

  val oracle: Map[String, String] = Map(
    "dq_generation_drift" -> generationDriftOracle,
    "dq_constraint_check" -> constraintCheckOracle,
    "dq_uniqueness_audit" -> uniquenessAuditOracle,
    "dq_freshness" -> freshnessOracle
  )
}
