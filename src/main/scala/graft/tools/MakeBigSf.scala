package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (r19, VERDICT r18 item 8): synthesize a LARGER corpus
  * from sf0.1 for scaling spot-checks — the driver's deterministic
  * testdata stops at sf0.1, where every query is fixed-overhead
  * dominated and the 8-vs-32-core block cannot show parallel scaling.
  *
  * Construction: `copies` disjoint shifted replicas of every fact
  * table (ids offset by c·10^10 — divisible by every id-modulus the
  * queries use, so seed/slice predicates keep their per-copy
  * semantics). Prices get +c/100 so distinct-value grids grow ×c
  * (rank-family realism); document text gets a per-copy suffix token
  * so exact/near-dup structure replicates within copies instead of
  * collapsing across them; embedding labels shift so semantic-dedup
  * blocks replicate instead of fusing into ×copies-sized cells. The
  * co-purchase graph becomes `copies` disjoint components of the
  * original shape. Measurement data ONLY — never oracle-compared,
  * never committed.
  */
object MakeBigSf {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val copies = args(2).toInt
    val spark = graft.util.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val Off = 10000000000L

    def make(t: String, ids: Seq[String], prices: Seq[String] = Nil,
        text: Option[String] = None, label: Option[String] = None): Unit = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = (0 until copies).map { c =>
        var d = df
        ids.foreach { ic =>
          d = d.withColumn(ic,
            (col(ic) + lit(c * Off)).cast(df.schema(ic).dataType)) }
        prices.foreach { pc =>
          d = d.withColumn(pc,
            (col(pc) + lit(c * 0.01)).cast(df.schema(pc).dataType)) }
        text.foreach { tc =>
          if (c > 0) {
            d = d.withColumn(tc, concat(col(tc), lit(s" zq$c")))
            if (d.columns.contains("n_chars"))
              d = d.withColumn("n_chars", length(col(tc)).cast("long"))
          } }
        label.foreach { lc =>
          d = d.withColumn(lc,
            (col(lc) + lit(c * 1000)).cast(df.schema(lc).dataType)) }
        d
      }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t done")
    }

    make("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"),
      prices = Seq("l_extendedprice"))
    make("orders", Seq("o_orderkey", "o_custkey"),
      prices = Seq("o_totalprice"))
    make("customer", Seq("c_custkey"))
    make("supplier", Seq("s_suppkey"))
    make("part", Seq("p_partkey"))
    make("events", Seq("event_id", "user_id"))
    make("documents", Seq("doc_id"), text = Some("text"))
    make("embeddings", Seq("vec_id"), label = Some("label"))
    Seq("region", "nation").foreach(t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet"))
    spark.stop()
  }
}
