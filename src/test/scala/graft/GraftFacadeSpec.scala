package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public facade compiles to the same results as the underlying
  * operators. */
class GraftFacadeSpec extends AnyFunSuite {
  import TestSpark.spark

  test("facade: cosine and asOfProbe evaluate as library columns") {
    import spark.implicits._
    val r = Seq((Array(1f, 0f), Array(1f, 0f), Array(1L, 5L, 9L), 6L))
      .toDF("a", "b", "arr", "key")
      .select(Graft.cosine(col("a"), col("b")).as("cos"),
        Graft.asOfProbe(col("arr"), col("key")).as("asof"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getLong(1) == 5L)
  }

  test("facade: exactDedupSurvivors keeps one key per distinct payload") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val survivors = Graft.exactDedupSurvivors(df, col("id"), col("text"))
      .collect().map(_.getLong(0)).sorted
    assert(survivors.sameElements(Array(1L, 3L)))
  }

  test("facade: nearDuplicates delegates to the LSH pipeline") {
    import spark.implicits._
    val t = (0 until 40).map(i => s"f$i").mkString(" ")
    val out = Graft.nearDuplicates(Seq((1L, t), (2L, t)).toDF("doc_id", "text"))
    assert(out.count() == 1)
  }
}
