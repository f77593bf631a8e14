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

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      t("a) groupBy collect_set only") {
        li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .count()
      }
      t("b) + explode, no distinct") {
        li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
              |  transform(slice(ps, i + 2, size(ps)),
              |            y -> struct(x AS src, y AS dst))))""".stripMargin)).as("p"))
          .select(col("p.src").as("src"), col("p.dst").as("dst"))
          .count()
      }
      t("c) full current shape + checkpoint") {
        graft.ops.Composite4.coPurchaseHalfEdges(spark, dir).localCheckpoint()
      }
      t("d) self-join shape + distinct + checkpoint") {
        li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct().localCheckpoint()
      }
      t("e) double-Generate shape + distinct + checkpoint") {
        li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(col("ps"), posexplode(col("ps")))
          .toDF("ps", "i", "src")
          .select(col("src"),
            explode(slice(col("ps"), col("i") + lit(2),
              size(col("ps")))).as("dst"))
          .distinct().localCheckpoint()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
