package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking primitives (VERDICT r8 item 5).
  *
  * A bare `Window.orderBy(...)` with no partition funnels its whole
  * input through ONE task — acceptable for horizon-bounded aggregates
  * (daily series, vocabularies), a scale-killer for entity-sized
  * inputs (customers, documents: ~10^10 rows at the 100 TB target).
  * [[globalNtile]] computes SQL-semantics `ntile(b)` over a total
  * order with no single-partition stage, via the classic two-pass
  * distributed rank (the `evt_concurrency_peak` prefix-sum shape):
  *
  *   1. `repartitionByRange(parts)` on the sort key — each partition
  *      holds a contiguous key range (explicit numPartitions, so AQE
  *      never coalesces it back to one).
  *   2. Per-partition row counts → a `parts`-row table; prefix-sum
  *      offsets + the global total ride a broadcast back.
  *   3. Global row number = partition offset + per-partition
  *      `row_number`; the ntile bucket follows in pure integer
  *      arithmetic (first n%b buckets take one extra row — exactly
  *      the SQL ntile contract, asserted against DuckDB by the three
  *      oracle rows that use this).
  *
  * The sort key must extend to a TOTAL order (append a unique
  * tie-breaker) — otherwise rows equal under the sort may straddle a
  * range boundary and the per-partition `row_number` becomes
  * nondeterministic between runs.
  */
object DistRank {

  /** Scale-adaptive range-partition count (r18, guide §2 "make
    * partitioning scale-adaptive"): callers default to `parts = 0`,
    * which resolves to the session's `spark.sql.shuffle.partitions` —
    * the knob a cluster deployment already sizes to its data — instead
    * of a constant 32 tuned for the local bench (where shuffle
    * partitions == cpus == 32, so local behavior and numbers are
    * unchanged). Results are partition-count independent by
    * construction: every primitive here computes exact integer
    * arithmetic over a unique key axis (offsets are exact sums; the
    * global row number / successor are total-order properties).
    * The explicit numPartitions keeps AQE from coalescing the range
    * exchange back to one partition. */
  private def resolve(df: DataFrame, parts: Int): Int =
    if (parts > 0) parts
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** Append `as` = SQL `ntile(buckets)` over the total order `sort`.
    * No single-partition exchange at any width; determinism requires
    * `sort` to be a total order. */
  def globalNtile(df: DataFrame, as: String, buckets: Int,
      sort: Seq[Column], parts: Int = 0): DataFrame = {
    require(buckets > 0, s"globalNtile: buckets $buckets must be > 0")
    // Scratch-column collision guard (ADVICE r9): the pipeline claims
    // __pid/__off/__n/__rn internally; a caller frame already carrying
    // one would hit an ambiguous-reference error or a silent clobber.
    // Fail fast with the offending names instead.
    val clash = df.columns.toSet
      .intersect(Set("__pid", "__off", "__n", "__rn", as))
    require(clash.isEmpty,
      s"globalNtile: input already has column(s) ${clash.mkString(", ")} " +
        "— rename them (or the target column) before calling")
    // Lazy checkpoint: the ranged frame feeds both the count pass and
    // the rank pass; it materializes once (at the offsets' broadcast
    // collect, absorbing the range-sampling pass), and the rank pass
    // reads the cached blocks — input consumed at most twice
    // regardless of how many ntiles are chained above each other.
    val nParts = resolve(df, parts)
    val ranged = df.repartitionByRange(nParts, sort: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val offs = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy()))
      .select(col("__pid"), col("__off"), col("__n"))
    // rn is NAMED before use: the bucket CASE references it five
    // times, and an inline window expression would be replicated per
    // reference in the physical Window node.
    val rnCol = col("__off") +
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sort: _*))
    // Exact long division for non-negative operands: the numerator is
    // made an exact multiple first, so the double division is exact
    // for all values < 2^53 (bare `/` on longs returns DOUBLE and an
    // off-by-one at a bucket boundary would mis-shelve a row).
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    // SQL ntile over n rows: q = n div b, r = n mod b; buckets
    // 1..r hold q+1 rows, buckets r+1..b hold q. CASE keeps the
    // q-division unevaluated when q = 0 (n < b: every row its own
    // bucket — the first formula already yields rn).
    val q = expr(s"__n div $buckets")
    val r = pmod(col("__n"), lit(buckets.toLong))
    val thresh = r * (q + 1)
    val rn = col("__rn")
    val bucket = when(rn <= thresh || q === 0,
        idiv(rn - 1, q + 1) + 1)
      .otherwise(r + idiv(rn - 1 - thresh, q) + 1)
    ranged.join(broadcast(offs), "__pid")
      .withColumn("__rn", rnCol)
      .withColumn(as, bucket.cast("bigint"))
      .drop("__pid", "__off", "__n", "__rn")
  }

  /** Append `as` = Σ `weight` over rows whose `key` sorts STRICTLY
    * before this row's — the exclusive distributed prefix sum behind
    * exact average ranks on a grouped value axis (2·r̄ = 2·below +
    * cnt + 1). Same two-pass shape as [[globalNtile]]: range
    * partitions on the key, per-partition weight totals prefix-sum
    * into offsets over a `parts`-row (bounded) window, and the
    * within-partition exclusive cumsum rides a partition-local
    * window — no single-partition stage at any input width. `key`
    * must be UNIQUE per row (a grouped/distinct axis), which is what
    * makes the rowsBetween frame tie-safe. */
  def globalPrefixSum(df: DataFrame, as: String, key: Column,
      weight: Column, parts: Int = 0): DataFrame =
    globalPrefixSums(df, Seq(as -> weight), key, parts)

  /** Append `as` = the NEXT key in the global ascending order of
    * `key` (SQL `lead(key) over (order by key)`; NULL for the global
    * maximum), with no single-partition stage: range partition,
    * partition-local lead, and the cross-boundary successor filled
    * from the bounded per-partition first-key table (parts rows,
    * broadcast). `key` must be unique per row (a grouped/distinct
    * axis) — equal keys straddling a range boundary would make the
    * successor nondeterministic. */
  def globalLead(df: DataFrame, as: String, key: Column,
      parts: Int = 0): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("__pid", "__nextf", as))
    require(clash.isEmpty,
      s"globalLead: input already has column(s) ${clash.mkString(", ")} " +
        "— rename them (or the target column) before calling")
    val ranged = df.repartitionByRange(resolve(df, parts), key)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    // Non-empty partitions only appear here; lead over the __pid
    // order therefore skips empty ranges correctly.
    val firsts = ranged.groupBy(col("__pid")).agg(min(key).as("__f"))
      .select(col("__pid"),
        lead(col("__f"), 1).over(Window.orderBy(col("__pid")))
          .as("__nextf"))
    ranged.join(broadcast(firsts), "__pid")
      .withColumn(as, coalesce(
        lead(key, 1).over(Window.partitionBy(col("__pid")).orderBy(key)),
        col("__nextf")))
      .drop("__pid", "__nextf")
  }

  /** Multi-weight [[globalPrefixSum]]: append one exclusive prefix-sum
    * column per `(name, weight)` pair over the SAME total order, in a
    * single range-partition pass — the Jonckheere–Terpstra / KS shape,
    * where every group's cumulative count rides the one value axis.
    * One `repartitionByRange`, one `parts`-row offsets broadcast
    * carrying all weights, and one partition-local Window node
    * evaluating every cumsum (same spec → Spark collapses them); no
    * single-partition stage at any input width. Keys must be unique
    * per row, as in the single-weight form. */
  def globalPrefixSums(df: DataFrame, outs: Seq[(String, Column)],
      key: Column, parts: Int = 0): DataFrame =
    prefixSumsCore(df, outs, key, leadAs = None, parts)

  /** [[globalPrefixSums]] + [[globalLead]] FUSED: the prefix sums and
    * the global successor of `key` come out of ONE range exchange and
    * ONE partition-local Window node (same partitionBy/orderBy spec,
    * so Spark evaluates the cumsums and the lead together); the
    * cross-boundary successor rides the same bounded per-partition
    * offsets broadcast, extended with each partition's first key.
    * Composing the two standalone primitives costs a second range
    * exchange over the full grid — this is the one-pass form for
    * consumers that need both (the Wasserstein EDF-area shape). */
  def globalPrefixSumsWithLead(df: DataFrame, outs: Seq[(String, Column)],
      key: Column, leadAs: String, parts: Int = 0): DataFrame =
    prefixSumsCore(df, outs, key, leadAs = Some(leadAs), parts)

  /** [[globalPrefixSums]] + whole-relation TOTALS appended as constant
    * columns (one per `(name, expr)` pair), riding the SAME
    * per-partition offsets aggregate and broadcast — the total is the
    * unbounded-window sum of the per-partition sums, so consumers
    * that previously ran a separate global aggregate + crossJoin
    * broadcast for Σweight-style scalars (rank-family tie terms,
    * grand totals) get them for free out of the one ranged pass
    * (r19, guide §1.2/§2.4 — fewer passes). Exact-integer sums, so
    * the values are bit-identical to the standalone aggregate's. */
  def globalPrefixSumsWithTotals(df: DataFrame, outs: Seq[(String, Column)],
      key: Column, totals: Seq[(String, Column)],
      parts: Int = 0): DataFrame =
    prefixSumsCore(df, outs, key, leadAs = None, parts, totals)

  private def prefixSumsCore(df: DataFrame, outs: Seq[(String, Column)],
      key: Column, leadAs: Option[String], parts: Int,
      totals: Seq[(String, Column)] = Nil): DataFrame = {
    require(outs.nonEmpty, "globalPrefixSums: no output columns requested")
    val names = outs.map(_._1)
    val totNames = totals.map(_._1)
    val allNames = names ++ totNames ++ leadAs.toSeq
    require(allNames.distinct == allNames,
      s"globalPrefixSums: duplicate output name in ${allNames.mkString(", ")}")
    val scratch = Set("__pid", "__nextf") ++ names.map("__off_" + _) ++
      totNames.map("__t_" + _)
    val clash = df.columns.toSet.intersect(allNames.toSet ++ scratch)
    require(clash.isEmpty,
      s"globalPrefixSums: input already has column(s) ${clash.mkString(", ")} " +
        "— rename them (or the target columns) before calling")
    val ranged = df.repartitionByRange(resolve(df, parts), key)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val sums = outs.map { case (n, w) => sum(w).as(s"__c_$n") } ++
      totals.map { case (n, w) => sum(w).as(s"__t_$n") } ++
      leadAs.map(_ => min(key).as("__f")).toSeq
    val offWin = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totWin = Window.partitionBy()
    val offs = ranged.groupBy(col("__pid"))
      .agg(sums.head, sums.tail: _*)
      .select(col("__pid") +: (names.map(n =>
        coalesce(sum(col(s"__c_$n")).over(offWin), lit(0L))
          .as(s"__off_$n")) ++
        totNames.map(n => sum(col(s"__t_$n")).over(totWin).as(n)) ++
        leadAs.map(_ => lead(col("__f"), 1)
          .over(Window.orderBy(col("__pid"))).as("__nextf")).toSeq): _*)
    val partWin = Window.partitionBy(col("__pid")).orderBy(key)
    val cumWin = partWin.rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offs), "__pid")
      .select(df.columns.toSeq.map(col) ++ outs.map { case (n, w) =>
        (col(s"__off_$n") + coalesce(sum(w).over(cumWin), lit(0L))).as(n)
      } ++ totNames.map(col) ++ leadAs.map(a =>
        coalesce(lead(key, 1).over(partWin), col("__nextf")).as(a)).toSeq: _*)
  }
}
