package graft.util

import org.apache.spark.sql.SparkSession

/** Single definition of the engine's session config — Verify, Bench,
  * Explain, and the test fixture all build through here so a new
  * session-level flag (like the parquet-nanos one) can never be set
  * in one entry point and missed in another. */
object Sessions {

  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.loadEvents
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // WindowExec warns "No Partition Defined" on ANY global window —
    // including the engine's bounded ones (rrfFuse and the global
    // top-k rankers all run over post-limit inputs of ≤100–1000 rows,
    // audited in VERDICT r4). The warning is noise for those plans
    // and it spams the driver's truncated stdout tail, so this one
    // logger is pinned to ERROR for engine-built sessions.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
