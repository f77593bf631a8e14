package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for declared queries
  * (all, or the names passed after sfDir) — the plan-audit loop the
  * scale review runs (pushdown reached the scan? broadcast pinned?
  * codegen spans wide? no stray shuffle?). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        println(s"\n===== $name =====")
        // formatted (default) omits codegen ids; simple mode's *(n)
        // stars are the codegen-span audit, so make the mode pickable
        try fn(spark, sfDir)
          .explain(sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "formatted"))
        catch { case e: Throwable => println(s"error: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
