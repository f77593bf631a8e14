package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-case guards for the round-24 batch-9 row (SURVEY §2.67):
  * Kruskal-Wallis rank test.
  */
class Round47Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  test("kruskalWallisOn: tie-free singletons score H = 4; a tie pair corrects to exactly 5") {
    // One order per group at 1..5: ranks 1..5, H = 3*220/30 - 18 = 4,
    // no ties.
    val singles = Prios.zipWithIndex
      .map { case (p, i) => (p, (i + 1).toDouble) }
      .toDF("o_orderpriority", "o_totalprice")
    val r1 = graft.ops.Composite51.kruskalWallisOn(singles)
      .as[(Long, Double, Boolean)].collect().head
    assert(r1 == ((5L, 4.0, false)))
    // 1-URGENT = {1, 1} (a tie pair), others 2..5 singly: raw
    // H = 34/7, tie correction C = 34/35 -> H' = exactly 5.
    val tied = (Seq(("1-URGENT", 1.0), ("1-URGENT", 1.0)) ++
      Prios.tail.zipWithIndex.map { case (p, i) => (p, (i + 2).toDouble) })
      .toDF("o_orderpriority", "o_totalprice")
    val r2 = graft.ops.Composite51.kruskalWallisOn(tied)
      .as[(Long, Double, Boolean)].collect().head
    assert(r2 == ((6L, 5.0, false)))
  }
}
