package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration path: custom expressions
  * callable from plain SQL in an extension-built session. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers array_max_le and cosine_sim for SQL") {
    // getOrCreate() would return any already-active session and skip
    // the extensions, so clear the active/default handles first; the
    // builder then creates a fresh session (reusing the JVM's
    // SparkContext) with the extensions applied.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val r1 = spark.sql(
        "SELECT array_max_le(array(1L, 5L, 9L), 6L) AS v").collect()(0)
      assert(r1.getLong(0) == 5L)
      val r2 = spark.sql(
        """SELECT cosine_sim(
          |  array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
          |  array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS v""".stripMargin)
        .collect()(0)
      assert(math.abs(r2.getDouble(0) - 1.0) < 1e-12)
      val r3 = spark.sql(
        """SELECT dot_product(
          |  array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)),
          |  array(CAST(4 AS FLOAT), CAST(5 AS FLOAT))) AS v""".stripMargin)
        .collect()(0)
      assert(r3.getDouble(0) == 23.0)
      // FuseDotProduct rewrites the HOF sum-of-squares into the
      // codegen kernel — visible in the optimized plan, same value.
      // Must run over a file source: literal/local inputs are
      // constant-folded/locally evaluated before the plan can be seen.
      val df = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
        .selectExpr("vec_id",
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS norm_sq")
      assert(df.queryExecution.optimizedPlan.toString.contains("dot_product"),
        s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
      // unit-norm corpus: every norm_sq ~ 1.0
      val v = df.orderBy("vec_id").collect()(0).getDouble(1)
      assert(math.abs(v - 1.0) < 1e-3, s"norm_sq = $v")
      // round-3 kernels callable from SQL
      val r4 = spark.sql(
        "SELECT sorted_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS v").collect()(0)
      assert(r4.getDouble(0) == 0.5)
      val r5 = spark.sql(
        "SELECT size(minhash_sig(array(11L, 22L), 16)) AS n").collect()(0)
      assert(r5.getInt(0) == 16)
      // non-literal numHashes → clean analysis error
      val eNf = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT minhash_sig(array(1L), CAST(id AS INT)) FROM range(1)").collect()
      }
      assert(eNf.getMessage.contains("foldable"), eNf.getMessage)
      // simhash_sig: all-same tokens → every set bit of the hash
      val r6 = spark.sql(
        "SELECT simhash_sig(array(xxhash64('a'), xxhash64('a'))) = xxhash64('a') AS eq")
        .collect()(0)
      assert(r6.getBoolean(0),
        "simhash of identical tokens must equal the token hash")
      // wrong arity from SQL → clean AnalysisException, not
      // IndexOutOfBoundsException from children(1)
      for (bad <- Seq("cosine_sim(array(1.0F))",
                      "dot_product(array(1.0F), array(1.0F), array(1.0F))",
                      "array_max_le(array(1L))",
                      "sorted_jaccard(array(1L))",
                      "simhash_sig(array(1L), 2)")) {
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql(s"SELECT $bad").collect()
        }
        assert(e.getMessage.contains("2"), s"unhelpful arity error: ${e.getMessage}")
      }
    } finally {
      // don't stop() (the SparkContext is shared); restore handles
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
