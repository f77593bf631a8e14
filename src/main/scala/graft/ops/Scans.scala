package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Tables._

/** SURVEY.md §2.1 — scans, sources, sinks.
  *
  * Scale notes: parquet scans are vectorized and benefit from column
  * pruning + predicate pushdown (verified via explain: ReadSchema /
  * PushedFilters). The roundtrip queries write to a per-sf /tmp path
  * so Verify (sf0.01) and Bench (sf0.1) never collide.
  */
object Scans {

  /** Per-run unique (applicationId) so two concurrent runs against
    * the same scale factor can't clobber each other's roundtrip
    * files between write and read-back; each path is deleted on JVM
    * exit so repeated verify/bench loops don't fill /tmp. */
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  private[graft] def tmp(s: SparkSession, dir: String, tag: String): String = {
    // Basename alone is ambiguous (two corpora named "sf0.01" under
    // different parents would share a path while DiskMemo/GraphBfs
    // key on the CANONICAL dir); an 8-hex md5 of the canonical path
    // makes path uniqueness match key uniqueness.
    val canon = new java.io.File(dir).getCanonicalPath
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    // Scratch base dir (r19, VERDICT r18 item 3): node-local /tmp is
    // only correct in local mode — on a cluster whose defaultFS is
    // file://, a multi-executor parquet write to one node's /tmp
    // yields a view no other node can read. `spark.graft.scratch.dir`
    // points the materialized views at shared storage (HDFS/S3/NFS);
    // the fallback keeps local behavior identical.
    val base = s.conf.getOption("spark.graft.scratch.dir")
      .map(_.stripSuffix("/")).getOrElse("/tmp")
    val p = s"$base/graft_${s.sparkContext.applicationId}_${tag}_${new java.io.File(dir).getName}_$digest"
    // Shutdown cleanup only for LOCAL paths (no scheme / file:):
    // java.io.File cannot delete remote URIs, and a shared scratch
    // dir's lifecycle belongs to its owner, not each driver.
    val local = !p.contains("://")
    if (local && cleanupRegistered.add(p)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRecursively(new java.io.File(p))))
    }
    p
  }

  /** 16-bit Morton (Z-order) interleave of two 8-bit values: bit i of
    * x lands at position 2i+1, bit i of y at 2i (x-first, so the
    * highest z bit is x's top bit). Pure long bit-ops → whole-stage
    * codegen; used by sink_zorder's layout rewrite. */
  private[graft] def morton(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Columns safe to round-trip through text formats: integral,
    * double (Java shortest-roundtrip formatting), and string. */
  private val rtCols = Seq("l_orderkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_returnflag")

  private val rtSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_returnflag", StringType)))

  private val rtOracle =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // (l_orderkey, l_linenumber) is NOT unique in this corpus — order
    // by the full output tuple so the hash compare can't tie-flake.
    "scan_parquet" -> ((s, dir) =>
      load(s, dir, "lineitem").orderBy(lineitemCols.head, lineitemCols.tail: _*)),

    // Hidden file-metadata column (_metadata.file_name, Spark >= 3.4):
    // per-file row counts straight off the scan — the lineage /
    // shard-audit primitive (which files fed this table, how many rows
    // each) with NO extra read cost; at 100 TB the same query audits
    // a million-file lake in one scan. The oracle pins the literal
    // file name: the driver corpus is one file per table by
    // construction (TESTDATA.md), so the name is SF-independent and a
    // wrong/missing metadata column reds the row.
    "scan_file_metadata" -> ((s, dir) =>
      load(s, dir, "orders")
        .select(col("_metadata").getField("file_name").as("file_name"))
        .groupBy("file_name")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("file_name")),

    // Parquet bloom filters — the point-lookup accelerator for large
    // lakes: an equality/IN probe skips row groups whose bloom filter
    // excludes the key WITHOUT reading the column pages, which is
    // the difference between a full-column scan and a handful of row
    // groups on a needle-in-haystack probe at 100 TB. Written on
    // l_partkey with an explicit expected-NDV, read back through an
    // IN probe. Round44Spec asserts the footer actually carries
    // bloom-filter offsets for l_partkey (a silently-ignored option
    // would still pass the data compare); the oracle checks the data
    // path against the original table.
    "scan_parquet_bloom_filter" -> ((s, dir) => {
      val p = tmp(s, dir, "bloomf")
      load(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        .write
        .option("parquet.bloom.filter.enabled#l_partkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_partkey", "200000")
        .mode(SaveMode.Overwrite).parquet(p)
      s.read.parquet(p)
        .filter(col("l_partkey").isin(1L, 17L, 42L))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          asD(sum(money(col("l_quantity")))).as("sum_qty"))
        .orderBy("l_partkey")
    }),

    // Only 2 of 11 columns: the parquet reader prunes (ReadSchema shows
    // just these two). Ordering by the full projected tuple keeps the
    // output deterministic without extra columns.
    "scan_parquet_pruned" -> ((s, dir) =>
      load(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .orderBy("l_orderkey", "l_quantity")),

    "scan_csv_roundtrip" -> ((s, dir) => {
      val p = tmp(s, dir, "csv")
      load(s, dir, "lineitem").select(rtCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).csv(p)
      s.read.schema(rtSchema).csv(p).orderBy(rtCols.head, rtCols.tail: _*)
    }),

    // Columnar non-parquet source: ORC roundtrip (types survive
    // exactly; vectorized ORC reader on the way back).
    "scan_orc_roundtrip" -> ((s, dir) => {
      val p = tmp(s, dir, "orc")
      load(s, dir, "lineitem").select(rtCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).orc(p)
      s.read.orc(p).orderBy(rtCols.head, rtCols.tail: _*)
    }),

    "scan_json_roundtrip" -> ((s, dir) => {
      val p = tmp(s, dir, "json")
      load(s, dir, "lineitem").select(rtCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).json(p)
      // schema inference path (long/double/string all infer losslessly)
      s.read.json(p)
        .select(rtCols.map(col): _*) // inferred schemas sort fields; restore order
        .withColumn("l_linenumber", col("l_linenumber").cast("int"))
        .orderBy(rtCols.head, rtCols.tail: _*)
    }),

    // Hive-style partitioned write, then read back and count per
    // partition — the count survives the value->directory roundtrip.
    "sink_parquet" -> ((s, dir) => {
      val p = tmp(s, dir, "sinkpart")
      load(s, dir, "lineitem")
        .write.mode(SaveMode.Overwrite).partitionBy("l_returnflag").parquet(p)
      s.read.parquet(p).groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // Partition pruning: the filter on the partition column selects one
    // directory; explain shows PartitionFilters, not a full scan.
    "sink_partition_prune" -> ((s, dir) => {
      val p = tmp(s, dir, "sinkprune")
      load(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
        .write.mode(SaveMode.Overwrite).partitionBy("l_returnflag").parquet(p)
      s.read.parquet(p).filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt"), asD(sum(money(col("l_quantity")))).as("qty"))
    }),

    // Line-oriented text source: write documents.text as raw lines,
    // read back with spark.read.text. Corpus text is single-line, so
    // rows survive 1:1; ordering by the single value column is the
    // full-tuple determinism rule.
    "scan_text_roundtrip" -> ((s, dir) => {
      val p = tmp(s, dir, "text")
      load(s, dir, "documents").select(col("text"))
        .write.mode(SaveMode.Overwrite).text(p)
      s.read.text(p).orderBy("value")
    }),

    // Whole-file binary source (the multimodal ingestion path): each
    // selected doc written as its own file under doc_id=N/ via a
    // partitioned text sink, read back with format("binaryFile")
    // recursively; the byte length equals n_chars + 1 (the text
    // writer's trailing newline), which the documents table oracles.
    "scan_binaryfile" -> ((s, dir) => {
      val p = tmp(s, dir, "binfile")
      load(s, dir, "documents").filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"), col("text"))
        .write.mode(SaveMode.Overwrite).partitionBy("doc_id").text(p)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "part-*") // skip _SUCCESS markers
        .load(p)
        .select(col("doc_id").cast("long").as("doc_id"),
          length(col("content")).cast("long").as("n_bytes"))
        .groupBy("doc_id") // a doc may split across part files
        .agg(sum(col("n_bytes")).as("n_bytes"))
        .orderBy("doc_id")
    }),

    // Spark 4 built-in XML source (the spark-xml merge): same
    // roundtrip contract as the CSV/JSON/ORC rows — explicit schema
    // on the way back, shortest-roundtrip double formatting. XML
    // parse cost is ~5× the text formats', so the roundtrip covers a
    // deterministic 20% key slice — identical source semantics,
    // bench latency in line with the other roundtrips.
    "scan_xml_roundtrip" -> ((s, dir) => {
      val p = tmp(s, dir, "xml")
      load(s, dir, "lineitem").filter(col("l_orderkey") % 5 === 0)
        .select(rtCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("rootTag", "rows").option("rowTag", "row")
        .format("xml").save(p)
      s.read.schema(rtSchema).option("rowTag", "row").format("xml").load(p)
        .orderBy(rtCols.head, rtCols.tail: _*)
    }),

    // Malformed-record handling (every real ingest's first problem):
    // a CSV generation with deterministically-corrupted rows (every
    // 50th doc writes a non-numeric n_chars) read back PERMISSIVE
    // with a corrupt-record column — bad rows are quarantined, not
    // dropped and not job-fatal, and the good subset aggregates
    // exactly. The corruption is a pure row property, so the oracle
    // reconstructs both populations from the source table.
    "scan_csv_malformed" -> ((s, dir) => {
      val p = tmp(s, dir, "csvbad")
      load(s, dir, "documents")
        .select(concat_ws(",", col("doc_id"),
          when(col("doc_id") % 50 === 0, lit("BAD"))
            .otherwise(col("n_chars").cast("string")),
          col("lang")).as("value"))
        .write.mode(SaveMode.Overwrite).text(p)
      val badSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType),
        StructField("lang", StringType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(badSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(p)
        .agg(count(lit(1)).as("total"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("n_chars")))
            .as("sum_chars_good"))
    }),

    // Small-file compaction (the table-maintenance job every
    // long-lived 100 TB table runs): a 64-way fragmented write is
    // compacted by a range-repartition on the sort key down to 4
    // files, each internally sorted — restoring both file sizes and
    // the clustering that makes min/max row-group pruning effective.
    // Round4Spec asserts the physical file counts (64 -> 4); the
    // oracle checks the data survived byte-exactly.
    "sink_compact" -> ((s, dir) => {
      val p = tmp(s, dir, "compact")
      load(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
        .repartition(64)
        .write.mode(SaveMode.Overwrite).parquet(s"$p/small")
      s.read.parquet(s"$p/small")
        .repartitionByRange(4, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode(SaveMode.Overwrite).parquet(s"$p/compacted")
      s.read.parquet(s"$p/compacted")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          asD(sum(money(col("l_quantity")))).as("qty"))
        .orderBy("l_returnflag")
    }),

    // MERGE-style upsert rewrite (the DML every warehouse runs,
    // expressed engine-agnostically): target customer rows full-outer
    // joined with a CDC update feed (latest purchase value per user,
    // keys shifted so all three actions occur) → matched rows update,
    // source-only rows insert, target-only rows keep. The merged
    // generation is WRITTEN and read back — the copy-on-write shape
    // table formats implement natively. One shuffle on the merge key.
    "sink_merge_upsert" -> ((s, dir) => {
      val p = tmp(s, dir, "merge")
      val t = load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val u = Events.latestByKey(
          loadEvents(s, dir).filter(col("event_type") === "purchase")
            .select("user_id", "value", "ts", "event_id"),
          Seq("user_id"), Seq("ts", "event_id"))
        .select((col("user_id") + 1400L).as("user_id"),
          col("value").as("new_bal"))
      t.join(u, col("c_custkey") === col("user_id"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("user_id")).as("key"),
          coalesce(col("c_name"), lit("NEW")).as("name"),
          coalesce(col("new_bal"), col("c_acctbal")).as("acctbal"),
          when(col("c_custkey").isNull, "insert")
            .when(col("user_id").isNull, "keep")
            .otherwise("update").as("action"))
        .write.mode(SaveMode.Overwrite).parquet(p)
      s.read.parquet(p).orderBy("key")
    }),

    // Dynamic partition overwrite (the incremental-reload primitive):
    // generation 1 writes all five priority partitions; a second
    // overwrite carrying ONLY the 1-URGENT slice (prices doubled, so
    // the change is observable) replaces just that directory under
    // partitionOverwriteMode=dynamic — the other four partitions
    // survive untouched. A static overwrite would have deleted them,
    // so the read-back aggregate proves the mode. Doubling a 2-dp
    // price is exact in both double (×2 is a power of two) and
    // decimal, so the oracle's CASE reconstruction matches bit-wise.
    "sink_dynamic_overwrite" -> ((s, dir) => {
      val p = tmp(s, dir, "dynover")
      val o = load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      o.write.mode(SaveMode.Overwrite).partitionBy("o_orderpriority").parquet(p)
      o.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority").parquet(p)
      s.read.parquet(p).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          asD(sum(money(col("o_totalprice")))).as("total"))
        .orderBy("o_orderpriority")
    }),

    // Z-order clustered layout: orders rewritten sorted by the Morton
    // interleave of (o_custkey, epoch-day of o_orderdate), so a
    // range-partitioned file covers a bounded rectangle in BOTH
    // dimensions and parquet min/max stats prune files for filters on
    // EITHER column — the multi-dimensional generalization of
    // sink_compact's single-key clustering. Each dimension is min-max
    // scaled to 8 bits first (exact integer math, bounds computed
    // in-plan and broadcast): raw interleave would let the wider
    // domain's high bits monopolize the top z bits and degrade to a
    // single-column sort — the same range-normalization step
    // production OPTIMIZE ZORDER implementations perform. Round6Spec
    // asserts the skipping effect (a narrow custkey band touches ≤
    // half the z-ordered files but all of a date-clustered layout's).
    // The z value is layout-only (dropped before write), so the
    // oracle is the plain data-identity aggregate.
    "sink_zorder" -> ((s, dir) => {
      val p = tmp(s, dir, "zorder")
      val o = load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_totalprice", "o_orderpriority")
        .withColumn("xd", col("o_custkey"))
        .withColumn("yd",
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long"))
      val bounds = o.agg(min("xd").as("xlo"), max("xd").as("xhi"),
        min("yd").as("ylo"), max("yd").as("yhi"))
      o.crossJoin(broadcast(bounds))
        .withColumn("z", morton(
          expr("((xd - xlo) * 256) div (xhi - xlo + 1)"),
          expr("((yd - ylo) * 256) div (yhi - ylo + 1)")))
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_totalprice", "o_orderpriority")
        .write.mode(SaveMode.Overwrite).parquet(p)
      s.read.parquet(p).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          asD(sum(money(col("o_totalprice")))).as("total"))
        .orderBy("o_orderpriority")
    }),

    // Dynamic partition pruning: the fact is laid out partitioned by
    // l_returnflag; the join key IS the partition column and the dim
    // carries a selective filter Catalyst cannot see at planning time
    // (it is a runtime value of the build side). DPP inserts a
    // dynamicpruningexpression subquery into the fact's
    // PartitionFilters, so only the surviving partition directories
    // are listed and read — at 100 TB this is the difference between
    // scanning one partition and scanning the table. PlanSpec asserts
    // the pruning subquery is present; the oracle reconstructs the
    // semantics from the source table.
    "join_dpp" -> ((s, dir) => {
      import s.implicits._
      val p = tmp(s, dir, "dpp")
      load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_linestatus", "l_returnflag")
        .write.mode(SaveMode.Overwrite).partitionBy("l_returnflag").parquet(s"$p/fact")
      // the dim must be a REAL relation carrying a LIKELY-SELECTIVE
      // predicate: a LocalRelation's filter constant-folds away, and a
      // boolean-attribute filter (keep / keep = true) simplifies to a
      // bare attribute the PartitionPruning rule does not treat as
      // selective — a string comparison survives both optimizer passes
      Seq(("R", "keep"), ("A", "drop"), ("N", "drop")).toDF("flag", "tag")
        .write.mode(SaveMode.Overwrite).parquet(s"$p/dim")
      s.read.parquet(s"$p/fact")
        .join(broadcast(s.read.parquet(s"$p/dim")
            .filter(col("tag") === "keep")),
          col("l_returnflag") === col("flag"))
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          asD(sum(money(col("l_quantity")))).as("qty"))
        .orderBy("l_linestatus")
    }),

    // Schema evolution: two parquet generations (the second adds a
    // column) merged back by mergeSchema — the missing column reads
    // as NULL for old-generation rows, exactly the additive-column
    // migration path a long-lived 100 TB table lives through.
    "scan_parquet_merge_schema" -> ((s, dir) => {
      val p = tmp(s, dir, "evolve")
      val l = load(s, dir, "lineitem")
      l.filter(col("l_linenumber") % 2 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .write.mode(SaveMode.Overwrite).parquet(s"$p/gen1")
      l.filter(col("l_linenumber") % 2 === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .write.mode(SaveMode.Overwrite).parquet(s"$p/gen2")
      s.read.option("mergeSchema", "true").parquet(s"$p/gen1", s"$p/gen2")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          asc_nulls_first("l_extendedprice"))
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      ("SELECT * FROM lineitem ORDER BY " + lineitemCols.mkString(", ")),
    "scan_parquet_pruned" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_quantity",
    "scan_parquet_bloom_filter" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_partkey IN (1, 17, 42)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "scan_file_metadata" ->
      """SELECT 'orders.parquet' AS file_name,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM orders ORDER BY file_name""".stripMargin,
    "scan_csv_roundtrip" -> rtOracle,
    "scan_orc_roundtrip" -> rtOracle,
    "scan_xml_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_orderkey % 5 = 0
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag""".stripMargin,
    "scan_json_roundtrip" -> rtOracle,
    "sink_parquet" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "sink_partition_prune" ->
      """SELECT count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,

    "scan_text_roundtrip" ->
      "SELECT text AS value FROM documents ORDER BY value",

    // n_chars + 1: the text writer terminates each line with '\n'
    "scan_binaryfile" ->
      """SELECT doc_id, CAST(n_chars + 1 AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id % 100 = 0 ORDER BY doc_id""".stripMargin,

    "scan_csv_malformed" ->
      """SELECT count(*) AS total,
        |  count(*) FILTER (WHERE doc_id % 50 = 0) AS n_corrupt,
        |  CAST(sum(CASE WHEN doc_id % 50 <> 0 THEN n_chars END) AS BIGINT)
        |    AS sum_chars_good
        |FROM documents""".stripMargin,

    "sink_compact" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sink_merge_upsert" ->
      """WITH u AS (
        |  SELECT user_id + 1400 AS user_id, value AS new_bal
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1)
        |SELECT coalesce(c_custkey, user_id) AS key,
        |  coalesce(c_name, 'NEW') AS name,
        |  coalesce(new_bal, c_acctbal) AS acctbal,
        |  CASE WHEN c_custkey IS NULL THEN 'insert'
        |       WHEN user_id IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM customer FULL OUTER JOIN u ON c_custkey = user_id
        |ORDER BY key""".stripMargin,

    "join_dpp" ->
      """SELECT l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "sink_dynamic_overwrite" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 2 AS DECIMAL(17,2))
        |    ELSE CAST(o_totalprice AS DECIMAL(15,2)) END) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "sink_zorder" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "scan_parquet_merge_schema" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN l_linenumber % 2 = 1 THEN l_extendedprice END
        |    AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice NULLS FIRST""".stripMargin
  )
}
