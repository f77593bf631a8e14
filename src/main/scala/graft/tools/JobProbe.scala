package graft.tools
import org.apache.spark.scheduler._
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val jobs = scala.collection.mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (j.time, Option(j.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs(j.jobId)
        println(f"JOB ${j.jobId}%3d ${(j.time - t0) / 1000.0}%7.3f s  $d")
      }
    })
    // warm like the bench
    graft.ops.GraphBfs.sharedLevels(spark, dir, 3, 3)._1.count()
    println("---- timed rebuild ----")
    graft.ops.GraphBfs.reset()
    val t0 = System.nanoTime()
    graft.ops.GraphBfs.sharedLevels(spark, dir, 3, 3)._1.count()
    Thread.sleep(500)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
