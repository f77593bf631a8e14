package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round 18 — verdict punch-list item 1: `dq_benford_second_digit`
  * (Composite81) wired into the registry, with the planted cases the
  * r17 verdict asked for: the totals-<10 exclusion (no second integer
  * digit — position 2 of the DECIMAL(15,2) string is the decimal
  * point) and a known digit distribution against the pinned Nigrini
  * second-digit table.
  */
class Round57Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("benford second digit: <10 exclusion and planted distribution") {
    // 9.99 and 5.00 lack a second integer digit and must be excluded;
    // the rest contribute digits 0 (10.00), 9 (19.99), 5 (25.50 and
    // 25.10), 3 (137.25).
    val orders = Seq(9.99, 5.00, 10.00, 19.99, 25.50, 25.10, 137.25)
      .toDF("o_totalprice")
    val out = graft.ops.Composite81.benford2On(spark, orders)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0, 1L, 0.2), (3, 1L, 0.2),
      (5, 2L, 0.4), (9, 1L, 0.2)))
  }

  test("benford second digit: pinned expected shares are Nigrini's") {
    val orders = Seq(10.0, 21.0, 32.0, 43.0, 54.0, 65.0, 76.0, 87.0,
      98.0, 19.0).toDF("o_totalprice") // digits 0..9, one each
    val rows = graft.ops.Composite81.benford2On(spark, orders)
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    // Σ_{k=1..9} log10(1 + 1/(10k + d)), round 6 — spot-check the
    // endpoints and that the full table sums to 1.
    val byDigit = rows.toMap
    assert(byDigit(0) == 0.119679)
    assert(byDigit(9) == 0.084997)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-5)
  }

  test("registry: dq_benford_second_digit is declared with an oracle") {
    assert(SparkEntry.queries.contains("dq_benford_second_digit"))
    assert(SparkEntry.oracleSql.contains("dq_benford_second_digit"))
  }
}
