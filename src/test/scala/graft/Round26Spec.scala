package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 seventh batch (SURVEY §2.43): ABC classes and Fano
  * dispersion.
  */
class Round26Spec extends AnyFunSuite {
  import TestSpark._

  test("agg_abc_classification: A carries most revenue with fewest parts") {
    val rows = graft.ops.Composite26
      .queries("agg_abc_classification")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(rows.map(_.getString(0))))
    val byClass = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(byClass.contains("A") && byClass.contains("C"))
    val total = rows.map(_.getDouble(2)).sum
    assert(byClass("A")._2 / total >= 0.75,
      "class A must hold roughly its 80% revenue band")
    assert(byClass("A")._2 > byClass("C")._2,
      "A out-earns the tail by construction")
  }

  test("evt_fano_factor: positive mean; fano non-negative") {
    val rows =
      graft.ops.Composite26.queries("evt_fano_factor")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0)
      assert(r.getDouble(3) >= 0.0)
    }
  }
}
