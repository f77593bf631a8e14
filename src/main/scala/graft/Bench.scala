package graft
import org.apache.spark.sql.SparkSession

/** Bench entry point (driver contract, SURVEY §3 entry point 3).
  *
  * Prints ONE JSON line with the total and a bounded per-query map.
  * The driver keeps only the LAST ~2000 characters of stdout (verified:
  * BENCH_r01..r03 all have a 2000-char `tail` and `parsed: null` —
  * the full ~116-query map made the line ~2600 chars, so its head was
  * truncated and the driver could not parse it in ANY prior round).
  * The stdout line is therefore capped well under that window: it
  * always carries the BASELINE.md anchor queries plus the slowest
  * remaining queries that fit. The complete per-query map is written
  * to bench_full.json for the judge / later rounds.
  */
object Bench {
  /** Queries with a DuckDB anchor in BASELINE.md, plus the headline
    * composites — always present in the stdout JSON so every round is
    * comparable against the same anchors. */
  private val Anchors = Seq(
    "agg_pricing_summary", "join_multiway", "win_row_number_topk",
    "evt_session_window", "llm_simsearch_topk", "llm_dedup_exact",
    "llm_dedup_near", "join_asof", "sql_tpch_q3", "sql_tpch_q5",
    "sql_tpch_q10")

  /** Keep the stdout line comfortably inside the driver's 2000-char
    * tail: the line itself plus sbt's trailing "[success] Total time"
    * line (~75 chars) must both fit. */
  private val MaxLineChars = 1500

  /** Locale-pinned formatting: the f-interpolator uses the default JVM
    * locale, and a comma-decimal locale (de_DE, fr_FR) would emit
    * {"value":47,200,...} — malformed JSON, recreating the parse
    * failure this file exists to fix. */
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** 1-minute load average, or -1 outside Linux. Two consecutive
    * rounds of judge re-timing were needed to separate ambient CPU
    * steal from regression (VERDICT r9 item 2); recording machine
    * state in the artifact makes a noisy window adjudicable from
    * bench_full.json alone. */
  private def loadavg1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").getLines()
      .next().split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** (steal, total) jiffies from the aggregate cpu line of /proc/stat.
    * Steal is field 8 (user nice system idle iowait irq softirq STEAL);
    * a rising steal delta during the run is the hypervisor taking CPU
    * from this guest — the signature behind r8/r9's "rerun slower than
    * cold on identical code" readings. */
  private def cpuJiffies: (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else -1L, f.sum)
    } catch { case _: Throwable => (-1L, -1L) }

  /** Jiffies across a window, or None when either endpoint read failed
    * (-1 sentinel) — arithmetic ON the sentinel would otherwise emit
    * silently-wrong deltas into the artifact (ADVICE r10). */
  private def jiffyDelta(start: Long, end: Long): Option[Long] =
    if (start < 0 || end < 0) None else Some(end - start)

  /** JSON value for an optional jiffy count: the number, or null when
    * the window was unreadable — never a fabricated delta. */
  private def jl(o: Option[Long]): String =
    o.map(_.toString).getOrElse("null")

  /** Sustained-steal gate (VERDICT r12 item 1): a timing window is
    * suspect when the hypervisor took more than HALF a CPU-equivalent
    * for its duration (jiffies are 10 ms). The old 2-CPU bar let
    * r12's graph_common_neighbors record slip through 6x inflated —
    * 3,531 jiffies over 34.66 s is ~1 full CPU stolen the whole
    * window, sustained but sub-threshold. Floor of 100 jiffies
    * (1 CPU-second) keeps sub-second windows from flagging on
    * scheduler noise. Unreadable steal => not flagged (never retry on
    * a signal that does not exist). */
  private def stealSuspect(steal: Option[Long], wallSecs: Double): Boolean =
    steal.exists(_ > math.max((0.5 * wallSecs * 100.0).toLong, 100L))

  /** Prior-record regression gate (VERDICT r12 item 1): the pinned
    * bench_full.json is in git, and the same deterministic code on
    * the same data does not legitimately triple — a timing >3x its
    * prior record is the cheapest storm detector there is. The 1 s
    * absolute floor keeps sub-second jitter from flapping it, and
    * the 0.05 s prior floor ignores records too small to ratio. */
  private def priorSuspect(prior: Option[Double], secs: Double): Boolean =
    prior.exists(p => p >= 0.05 && secs > 3.0 * p && secs > 1.0)

  /** Previous pinned per-query records, read from the git-pinned
    * bench_full.json in cwd BEFORE this run overwrites it (override
    * with SPARK_GRAFT_PRIOR for adjudicated re-pins). Only the flat
    * top-level "queries" map is parsed — the nested "retimed" block
    * repeats the same key:number shape, so the scan is bounded to the
    * first brace pair after the queries key. Missing or unparsable
    * file => empty map, and both priorSuspect gates go inert. */
  private def priorRecords(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else {
      // keyFound distinguishes a legitimately empty "queries":{}
      // (a pin from a run where every query failed — fine, gate
      // inert by construction) from a missing/garbled key, which is
      // the format drift the warning exists for (ADVICE r13 + r14).
      var keyFound = false
      var bodyNonEmpty = false
      val parsed = try {
        val src = scala.io.Source.fromFile(f)
        val txt = try src.mkString finally src.close()
        val key = "\"queries\":{"
        val start = txt.indexOf(key)
        if (start < 0) Map.empty[String, Double]
        else {
          keyFound = true
          val body = txt.substring(start + key.length, txt.indexOf('}', start))
          bodyNonEmpty = body.trim.nonEmpty
          """"([A-Za-z0-9_]+)":(-?[0-9.]+)""".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      } catch { case _: Throwable => Map.empty[String, Double] }
      // A present-but-unparsable pin means format drift, not a fresh
      // checkout — without this line the >3x regression gate goes
      // inert with no signal anywhere in the run output (ADVICE r13).
      // Drift INSIDE the brace body (entries present but no longer
      // matching the strict "name":number shape) must warn too: only
      // a key that is present AND legitimately empty stays silent
      // (ADVICE r15).
      if (parsed.isEmpty && (!keyFound || bodyNonEmpty))
        System.err.println(s"[bench] $path exists but zero priors parsed" +
          " — the >3x prior-record gate is INERT this run (format drift?)")
      parsed
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.Sessions.local(cpus)
    // Warm-up: absorb JVM/codegen/session fixed cost so the first
    // timed query isn't charged ~8 s of warm-up (VERDICT r1: the
    // first-measured join absorbed it and looked like a plan defect).
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Optional comma-separated query filter for isolated timing runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // Memo builds as first-class timed entries (VERDICT r16 item 2):
    // GraphBfs.sharedLevels and DiskMemo's linkpred candidate table
    // are parquet materialized views built once per JVM; consumer
    // timings measure read-back steady state, so without these rows
    // the ~4-6 s build cost landed in the untimed warm pass and
    // appeared in NO query — the total understated the suite's true
    // cost. Each fn resets the per-JVM registry first, so the timed
    // pass (and every retry attempt) measures a genuine rebuild —
    // the materialized-view refresh a capacity planner budgets.
    // Iteration order does not matter: a consumer running first
    // triggers an untimed build in its warm pass exactly as before,
    // and the explicit row still reports the true rebuild cost.
    // r18: each memo row resets ONLY its own table (DiskMemo.reset(tag))
    // so its timed rebuild is not charged with every other memo's
    // rebuild. The co-purchase half-edge list — consumed by ~18 graph
    // rows, a per-query rebuild until r17 — is now a DiskMemo view and
    // gets its own timed row, FIRST, so the later memo rows (whose
    // builds read the edge view) measure their own work on top of a
    // materialized edge list, exactly like every other consumer.
    val memoBuilds = Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "memo_order_psets" -> ((s, d) => {
        graft.ops.DiskMemo.reset("order_psets")
        graft.ops.Composite4.sharedOrderPsets(s, d)
      }),
      "memo_copurchase_weighted" -> ((s, d) => {
        graft.ops.DiskMemo.reset("copurchase_weighted")
        graft.ops.Composite33.coPurchaseWeightedHalf(s, d)
      }),
      "memo_copurchase_half" -> ((s, d) => {
        graft.ops.DiskMemo.reset("copurchase_half")
        graft.ops.Composite4.coPurchaseHalfEdges(s, d)
      }),
      "memo_grams3" -> ((s, d) => {
        graft.ops.DiskMemo.reset("grams3")
        graft.ops.LlmOps19.sharedGrams(s, d)
      }),
      "memo_shingle_postings" -> ((s, d) => {
        graft.ops.DiskMemo.reset("shingle_postings")
        graft.ops.LlmOps19.sharedPostings(s, d)
      }),
      "memo_bigramsets" -> ((s, d) => {
        graft.ops.DiskMemo.reset("bigramsets")
        graft.ops.LlmOps2.sharedBigramSets(s, d)
      }),
      "memo_tri_adjacency" -> ((s, d) => {
        graft.ops.TriCore.resetAll()
        graft.ops.TriCore.sharedAdj(s, d) // forces deg + oriented too
      }),
      "memo_bfslevels_3_3" -> ((s, d) => {
        graft.ops.GraphBfs.reset()
        graft.ops.GraphBfs.sharedLevels(s, d, seeds = 3, k = 3)._1
      }),
      "memo_linkpred_cands" -> ((s, d) => {
        graft.ops.DiskMemo.reset("linkpred_cands")
        graft.ops.Composite36.sharedLinkpredCandidates(s, d)
      }))
    val unknown = only.diff(SparkEntry.queries.keySet ++ memoBuilds.map(_._1))
    if (unknown.nonEmpty)
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only(k) }
    val timedAll = scala.collection.immutable.ListMap((selected.toSeq ++ (
      if (only.isEmpty) memoBuilds
      else memoBuilds.filter { case (k, _) => only(k) })): _*)
    val prior =
      priorRecords(sys.env.getOrElse("SPARK_GRAFT_PRIOR", "bench_full.json"))
    if (timedAll.isEmpty)
      System.err.println("[bench] no queries selected — emitting empty result")
    // Audit trail for the best-of-2 policy (ADVICE r8): every re-timed
    // query records BOTH measurements in bench_full.json, so the
    // cold-vs-rerun spread is inspectable per query per round instead
    // of vanishing into the min.
    val loadStart = loadavg1
    val (stealStart, totalStart) = cpuJiffies
    val runStartNanos = System.nanoTime()
    // Per retimed query: cold timing + the cold window's own steal
    // delta + EVERY rerun attempt (secs, loadavg, per-attempt steal
    // window) — the judge adjudicates a cold-vs-rerun anomaly against
    // the machine state that produced each individual attempt instead
    // of a bench-cumulative counter (VERDICT r10 item 1).
    case class Attempt(secs: Double, load: Double, steal: Option[Long])
    val retimed = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Option[Long], List[Attempt])]
    // Per-query storm verdict (VERDICT r11 item 4): a query is
    // SUSPECT when the measurement that fed its reported time was
    // itself taken inside a steal storm — the artifact then
    // self-identifies contaminated entries instead of relying on a
    // commit-message convention. Each entry carries WHICH gate fired
    // (ADVICE r13): "steal" is machine contamination, "prior" alone
    // on a clean-steal window reads as a genuine >3x regression the
    // retries could not shake — a real slowdown, not a storm.
    val suspects =
      scala.collection.mutable.ListBuffer.empty[(String, String)]
    def suspectReason(steal: Option[Long], secs: Double,
        p: Option[Double]): String =
      (stealSuspect(steal, secs), priorSuspect(p, secs)) match {
        case (true, true) => "steal+prior"
        case (true, _)    => "steal"
        case _            => "prior"
      }
    val results = timedAll.map { case (name, fn) =>
      // Warm once per query (plan compilation + whole-stage codegen
      // class generation are one-time costs, ~2.5s for the widest
      // plans), GC outside the timed window (heap pressure from a
      // previous query otherwise bleeds 2-3x swings into the heavy
      // dedup timings), then time the warm execution — mirroring how
      // the DuckDB baseline numbers in BASELINE.md were taken.
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      // The warm run materialized its own localCheckpoint/persist
      // blocks; the timed run constructs NEW DataFrames and
      // materializes a SECOND copy of every one of them. Leaving the
      // warm copies persisted doubles storage pressure exactly while
      // the timed copies are being written — measured as bimodal 3-4x
      // spikes on the checkpoint/persist-heavy graph/dedup queries
      // (llm_dedup_cluster 5.6 s vs 14.8-19.9 s across back-to-back
      // runs of identical code). Drop EVERYTHING, BLOCKING, so the
      // timed window starts from a clean storage pool. This does NOT
      // change what any query measures: every persist/cache in the
      // query set is built WITHIN a single invocation (cache_reuse
      // re-caches per call and unpersists its previous call's copy at
      // entry — its warm reuse is the two branches inside one call,
      // never cross-invocation), so the timed run rebuilds exactly
      // what it would on a fresh session.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // Double GC with a settle pause: broadcast/shuffle blocks from
      // prior queries are reclaimed by the ContextCleaner only after
      // their driver references are collected, and the cleaner runs
      // async — one gc() alone left blocks pinning executor memory
      // and doubled the heavy queries' timings mid-run.
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
      val coldSteal0 = cpuJiffies._1
      val t0 = System.nanoTime()
      var ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      var elapsed = (System.nanoTime() - t0) / 1e9
      val coldSteal = jiffyDelta(coldSteal0, cpuJiffies._1)
      // Best-of-2 for slow first measurements: the multi-job
      // iterative queries (graph_*, llm_dedup_cluster) are fixed-cost
      // dominated at sf0.1 — identical deterministic work measured
      // 6.8 s vs 16.5 s across back-to-back fresh-JVM runs (r7's
      // "bimodal" finding; profiled this round as JIT compile storms
      // on the many per-round codegen classes, not storage pressure).
      // A single re-run after the same cleanup discipline lands in
      // the fast mode with high probability, and min-of-N is the
      // standard variance control for deterministic benchmarks (the
      // DuckDB anchors in BASELINE.md are warm best-run numbers too).
      // The 2 s gate bounds the added wall-clock to the slow tail
      // (~15 queries), keeping the driver's total run time close.
      // Suspect-aware retry (VERDICT r12 item 1): the standard single
      // rerun, EXTENDED — when an attempt's own window is suspect
      // (sustained steal above half a CPU, OR >3x the git-pinned
      // record for this query) and no criterion-clean attempt has
      // landed yet, back off with doubling sleeps and try again,
      // bounded at 5 reruns. Fast (≤2 s) queries whose cold window is
      // suspect enter the same loop (ADVICE r12: they were previously
      // flagged but never retried). Every attempt is recorded, so
      // bench_full.json carries the full adjudication trail instead
      // of one min. min-of-all stays sound: steal only ever INFLATES
      // a timing, so extra attempts can recover the code's fast mode
      // but never fabricate one (r10: llm_dedup_cluster's 14.33 s
      // driver record was a 39k-jiffy storm covering both cold run
      // and rerun; the judge's idle retime measured 3.86 s).
      def windowSuspect(steal: Option[Long], secs: Double): Boolean =
        stealSuspect(steal, secs) || priorSuspect(prior.get(name), secs)
      val coldSuspect = windowSuspect(coldSteal, elapsed)
      if (ok && (elapsed > 2.0 || coldSuspect)) {
        val attempts = scala.collection.mutable.ListBuffer.empty[Attempt]
        var continue = true
        var backoffMs = 3000L
        while (continue) {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc(); Thread.sleep(200)
          val s0 = cpuJiffies._1
          val t1 = System.nanoTime()
          val ok2 = try { fn(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          if (ok2) {
            val secs = (System.nanoTime() - t1) / 1e9
            val st = jiffyDelta(s0, cpuJiffies._1)
            attempts += Attempt(secs, loadavg1, st)
            // The cold window counts as a clean attempt too (ADVICE
            // r11): when cold was clean but the first rerun is
            // stormy, a clean timing already feeds the min — burning
            // further reruns + sleeps is pure wasted wall-clock.
            val anyClean = !coldSuspect ||
              attempts.exists(a => !windowSuspect(a.steal, a.secs))
            continue = attempts.size < 5 && !anyClean
            if (continue) { // let the storm pass, doubling each time
              Thread.sleep(backoffMs)
              backoffMs = math.min(backoffMs * 2, 30000L)
            }
          } else continue = false
        }
        if (attempts.nonEmpty) {
          retimed(name) = (elapsed, coldSteal, attempts.toList)
          // Which measurement feeds the min decides the suspect flag:
          // the reported time is contaminated only if ITS window was.
          val all = Attempt(elapsed, -1.0, coldSteal) :: attempts.toList
          val best = all.minBy(_.secs)
          if (windowSuspect(best.steal, best.secs))
            suspects += name -> suspectReason(best.steal, best.secs,
              prior.get(name))
          elapsed = math.min(elapsed, attempts.map(_.secs).min)
        } else if (coldSuspect)
          suspects += name -> suspectReason(coldSteal, elapsed,
            prior.get(name))
      } else if (ok && coldSuspect)
        suspects += name -> suspectReason(coldSteal, elapsed,
          prior.get(name))
      // Drop cached relations the query registered AFTER the timed
      // run: cache_reuse-style queries .cache() and never unpersist,
      // so over a 300-query run the storage pool otherwise fills with
      // dead cached plans and squeezes execution memory (seen as
      // 3-5x in-run inflation of the heavy graph/dedup queries that
      // vanishes when re-timed solo). Clearing BEFORE the timed run
      // (the old placement) silently changed what cache-dependent
      // queries measure — a cold cache materialization instead of the
      // warm reuse the query exists to demonstrate.
      spark.catalog.clearCache()
      // Also drop persisted/locally-checkpointed RDD blocks: the
      // checkpoint-heavy graph/dedup queries pin edge/adjacency
      // blocks that are otherwise freed only when the ContextCleaner
      // notices the dead driver references — mid-run that lag
      // squeezed execution memory enough to inflate later 0.7 s
      // queries to 4-5 s. The query is done and counted; nothing
      // references these blocks.
      // BLOCKING: an async release can lag into the next query's
      // timed window under storage pressure — the block-manager wait
      // happens here, outside any timed region.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // -1 is the driver's failure sentinel — a throwing query must
      // not report its time-to-exception as a legitimate timing
      name -> (if (ok) elapsed else -1.0)
    }
    // Failed queries carry the -1 sentinel in the per-query map but
    // must not subtract fictitious time from the headline total.
    val total = results.values.filter(_ >= 0).sum
    // Suspect-aware total (VERDICT r12 item 7): the sum excluding
    // suspect rows, reported alongside the raw total, so a single
    // contaminated query can never move the headline number again.
    val suspectSet = suspects.map(_._1).toSet
    val totalExclSuspect = results.collect {
      case (k, v) if v >= 0 && !suspectSet(k) => v }.sum
    val nFailed = results.values.count(_ < 0)
    if (nFailed > 0)
      System.err.println(s"[bench] $nFailed quer${if (nFailed == 1) "y" else "ies"} FAILED (reported as -1)")

    // Full per-query map → bench_full.json (cwd is the repo root under
    // both the driver's sbt invocation and tools/run_class.sh).
    // SPARK_GRAFT_ONLY runs land in bench_only.json instead:
    // bench_full.json must always hold the COMPLETE surface — a
    // filtered debug run clobbering it once cost a round's snapshot.
    val fullQs = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    // "rerun"/"load"/"steal_jiffies" describe the BEST attempt (the
    // one that fed the min); "attempts" carries every attempt in
    // order, each with its own steal window (null = /proc unreadable).
    val retimedQs = retimed.map { case (k, (c, cst, atts)) =>
      val best = atts.minBy(_.secs)
      val attsJson = atts.map(a =>
        s"""{"secs":${fmt(a.secs)},"load":${fmt(a.load)},"steal_jiffies":${jl(a.steal)}}""")
        .mkString("[", ",", "]")
      s""""$k":{"cold":${fmt(c)},"cold_steal_jiffies":${jl(cst)},""" +
        s""""rerun":${fmt(best.secs)},"load":${fmt(best.load)},""" +
        s""""steal_jiffies":${jl(best.steal)},"attempts":$attsJson}""" }
      .mkString("{", ",", "}")
    val loadEnd = loadavg1
    val (stealEnd, totalEnd) = cpuJiffies
    // Whole-run storm verdict, r12-tightened (VERDICT r12 item 2):
    // the old half-a-core-averaged bar returned clean:true for a run
    // with 41,461 steal jiffies (190x the r11 clean run's 217) while
    // one query carried a 6x artifact. The new bar sits near the
    // empirical clean floor — r11's clean run measured 217 jiffies,
    // the r13-session pristine pair 74/76 — so clean means steal
    // below 2,000 absolute jiffies OR below 0.05% of total jiffies.
    // steal_ratio is emitted so a contaminated total self-identifies
    // in the artifact. Unreadable steal => clean stays null, never a
    // fabricated verdict.
    val runSecs = (System.nanoTime() - runStartNanos) / 1e9
    val runSteal = jiffyDelta(stealStart, stealEnd)
    val runTotalJ = jiffyDelta(totalStart, totalEnd)
    val stealRatio = for { s <- runSteal; t <- runTotalJ if t > 0 }
      yield s.toDouble / t
    val cleanJson = runSteal match {
      case Some(s) => (s < 2000L || stealRatio.exists(_ < 0.0005)).toString
      case None => "null"
    }
    // Pragmatic bar beside the strict one (VERDICT r15 item 4): the
    // strict <0.0005 ratio has been unreachable on this host for two
    // rounds (every ~20-minute window carries ambient steal) so it
    // stopped discriminating good windows from storms. What the r15
    // pin adjudication actually accepted was steal below 0.2% WITH an
    // empty per-query suspect list; emit that verdict as
    // clean_pragmatic so a pin self-identifies without the reader
    // re-deriving the bar. The strict flag is kept unchanged.
    val cleanPragmaticJson = runSteal match {
      case Some(s) =>
        ((s < 2000L || stealRatio.exists(_ < 0.002)) && suspects.isEmpty).toString
      case None => "null"
    }
    val ratioJson = stealRatio
      .map(r => String.format(java.util.Locale.ROOT, "%.6f", Double.box(r)))
      .getOrElse("null")
    val suspectJson = suspects
      .map { case (q, why) => s"""{"q":"$q","reason":"$why"}""" }
      .mkString("[", ",", "]")
    val machine =
      s"""{"loadavg_start":${fmt(loadStart)},"loadavg_end":${fmt(loadEnd)},""" +
      s""""steal_jiffies":${jl(runSteal)},""" +
      s""""total_jiffies":${jl(runTotalJ)},""" +
      s""""steal_ratio":$ratioJson,""" +
      s""""run_secs":${fmt(runSecs)},"clean":$cleanJson,""" +
      s""""clean_pragmatic":$cleanPragmaticJson}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_excl_suspect":${fmt(totalExclSuspect)},"n_queries":${results.size},"queries":$fullQs,"retimed":$retimedQs,"suspect":$suspectJson,"machine":$machine,"sf":"$sfDir"}"""
    val outFile = if (only.nonEmpty) "bench_only.json" else "bench_full.json"
    try {
      val w = new java.io.PrintWriter(outFile)
      try w.println(fullLine) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] $outFile write failed: $e") }

    // Stdout line: anchors first, then the slowest remaining queries,
    // adding entries only while the line stays under MaxLineChars.
    val anchorEntries = Anchors.flatMap(a => results.get(a).map(a -> _))
    val rest = results.toSeq.filterNot { case (k, _) => Anchors.contains(k) }
      .sortBy { case (_, v) => -v }
    val ordered = anchorEntries ++ rest
    val prefix = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","clean":$cleanJson,"n_suspect":${suspects.size},"n_queries":${results.size},"detail":"$outFile","queries":{"""
    val suffix = s"""},"sf":"$sfDir"}"""
    val budget = MaxLineChars - prefix.length - suffix.length
    val picked = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    ordered.foreach { case (k, v) =>
      val ent = s""""$k":${fmt(v)}"""
      val cost = ent.length + (if (picked.isEmpty) 0 else 1)
      if (used + cost <= budget) { picked += ent; used += cost }
    }
    println(prefix + picked.mkString(",") + suffix)
    spark.stop()
  }
}
