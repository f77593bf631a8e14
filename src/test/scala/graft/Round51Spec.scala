package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-case guards for the round-26 batch-6 rows (SURVEY §2.84)
  * plus the registration-uniqueness contract (brute-fold laws live
  * in PropertiesSpec).
  */
class Round51Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("SparkEntry registration: no module silently overrides another's query id") {
    // Map ++ keeps the LAST binding, so a duplicated id across two
    // modules drops one implementation without any compile error —
    // exactly how the round-4 and round-15 llm_zipf_fit registrations
    // collided. Sum-of-module-sizes == merged-size proves global
    // uniqueness (any collision shrinks the merge); same for the
    // oracle maps, and oracle keys must be a subset of query keys.
    val dupQ = SparkEntry.modules.flatMap(_._1.keys)
      .groupBy(identity).filter(_._2.size > 1).keys
    assert(dupQ.isEmpty, s"duplicate query ids: ${dupQ.mkString(", ")}")
    val dupO = SparkEntry.modules.flatMap(_._2.keys)
      .groupBy(identity).filter(_._2.size > 1).keys
    assert(dupO.isEmpty, s"duplicate oracle ids: ${dupO.mkString(", ")}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toString)
  }

  // ---- evt_hodges_lehmann_shift --------------------------------------------

  test("hodgesLehmannOn: planted unit shift is recovered exactly") {
    // click = purchase + 3 each day: every pairwise diff of equal
    // days is 3; the weighted median is exactly 3.
    val ev = (0 until 10).flatMap { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString
      Seq.fill(5 + d % 3)(("click", date)) ++
        Seq.fill(2 + d % 3)(("purchase", date))
    }.toDF("event_type", "ts")
    val got = graft.ops.Composite67.hodgesLehmannOn(ev)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((10L, 10L, 3L)))
  }

  test("hodgesLehmannOn: identical samples shift 0; other types ignored") {
    val ev = ((0 until 8).flatMap { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString
      Seq.fill(4)(("click", date)) ++ Seq.fill(4)(("purchase", date)) ++
        Seq.fill(99)(("view", date))
    }).toDF("event_type", "ts")
    val got = graft.ops.Composite67.hodgesLehmannOn(ev)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((8L, 8L, 0L)))
  }

  // ---- agg_theil_index ------------------------------------------------------

  test("theilIndexOn: perfect equality scores 0 everywhere; known split decomposes") {
    val eq = Seq((0L, 100L), (0L, 100L), (1L, 100L), (1L, 100L))
      .toDF("nat", "x")
    val r0 = graft.ops.Composite67.theilIndexOn(eq)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(r0 == ((4L, 2L, 0.0, 0.0, 0.0)))
    // Within-equal but between-unequal: nation 0 members earn 300,
    // nation 1 members 100 → T_within = 0, T_total = T_between =
    // 0.75·ln(1.5) + 0.25·ln(0.5).
    val btw = Seq((0L, 300L), (0L, 300L), (1L, 100L), (1L, 100L))
      .toDF("nat", "x")
    val r1 = graft.ops.Composite67.theilIndexOn(btw)
      .as[(Long, Long, Double, Double, Double)].collect().head
    def floor6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val expect = floor6(0.75 * math.log(1.5) + 0.25 * math.log(0.5))
    assert(r1._1 == 4L && r1._2 == 2L)
    assert(math.abs(r1._3 - expect) <= 1e-6 && r1._5 == 0.0)
    assert(math.abs(r1._4 - expect) <= 1e-6)
  }
}
