package graft.tools
import org.apache.spark.scheduler._
object JobProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val q = args(1)
    val fn = graft.SparkEntry.queries(q)
    spark.sparkContext.addSparkListener(new SparkListener {
      val t0 = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit = t0.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        println(f"JOB ${j.jobId}%3d ${(j.time - t0.get(j.jobId)) / 1000.0}%7.3f s")
    })
    fn(spark, dir).count()  // warm
    println("---- timed ----")
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
