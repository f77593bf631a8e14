package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the contract surface).
  * Times labelled stages of the graph/dedup builds to localize where
  * the bench seconds go. Run via tools/run_class.sh graft.tools.Scratch.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up
    spark.read.parquet(s"$dir/lineitem.parquet").count()

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val near = t("ngramDupPairs build+count") {
        val n = graft.ops.LlmOps2.ngramDupPairs(spark, dir)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        println(s"  near pairs: ${n.count()}"); n
      }
      t("full dedup_cluster") {
        graft.SparkEntry.queries("llm_dedup_cluster")(spark, dir).count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
