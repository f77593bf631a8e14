package graft

import org.apache.spark.sql.SparkSession

/** Shared test fixture: one local[4] session over the sf0.001 smoke
  * corpus (SURVEY §5.2). */
object TestSpark {
  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.util.Sessions.local("4")

  /** Guards mutations of JVM-global state (sys.props overrides,
    * session-wide conf flips) that would otherwise leak into suites
    * running concurrently in the same forked JVM. Hold it for the
    * whole override window, not just the set/unset. */
  object globalConfLock
}
