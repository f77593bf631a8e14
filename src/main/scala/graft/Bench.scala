package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty)
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only(k) }
    if (selected.isEmpty)
      System.err.println("[bench] no queries selected — emitting empty result")
    val results = selected.map { case (name, fn) =>
      // Warm once per query (plan compilation + whole-stage codegen
      // class generation are one-time costs, ~2.5s for the widest
      // plans), GC outside the timed window (heap pressure from a
      // previous query otherwise bleeds 2-3x swings into the heavy
      // dedup timings), then time the warm execution — mirroring how
      // the DuckDB baseline numbers in BASELINE.md were taken.
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      // Double GC with a settle pause: broadcast/shuffle blocks from
      // prior queries are reclaimed by the ContextCleaner only after
      // their driver references are collected, and the cleaner runs
      // async — one gc() alone left blocks pinning executor memory
      // and doubled the heavy queries' timings mid-run.
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // -1 is the driver's failure sentinel — a throwing query must
      // not report its time-to-exception as a legitimate timing
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
