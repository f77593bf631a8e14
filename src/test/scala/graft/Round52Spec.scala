package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-case guards for the round-26 batch-7 rows (SURVEY §2.85):
  * Bowley quartile skewness and Parkinson range volatility (laws in
  * PropertiesSpec).
  */
class Round52Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bowleySkewOn: symmetric ladder scores 0; right-tail pulls positive") {
    // 1..5 once each: picked quartiles (k·n ≤ 4·cum rule, n=5) are
    // Q1=2 (cum 2 ≥ 5/4), Q2=3, Q3=4 → skew 0.
    val sym = (1L to 5L).map(v => ("A", v)).toDF("g", "v")
    val r0 = graft.ops.Composite68.bowleySkewOn(sym)
      .as[(String, Long, Long, Long, Long, Double)].collect().head
    assert(r0 == (("A", 5L, 2L, 3L, 4L, 0.0)))
    // 1,1,1,2,8: picked Q1=Q2=1 (cum(1)=3 covers both cuts), Q3=2
    // (cum reaches 3n/4 at value 2) → skew (2+1−2)/(2−1) = 1.
    val skewed = Seq(1L, 1L, 1L, 2L, 8L).map(v => ("A", v)).toDF("g", "v")
    val r1 = graft.ops.Composite68.bowleySkewOn(skewed)
      .as[(String, Long, Long, Long, Long, Double)].collect().head
    assert(r1 == (("A", 5L, 1L, 1L, 2L, 1.0)), r1.toString)
    // Constant group: Q3 − Q1 = 0 → NULL skew, not a crash.
    val const = Seq.fill(4)(("A", 7L)).toDF("g", "v")
    val r2 = graft.ops.Composite68.bowleySkewOn(const).collect().head
    assert(r2.getLong(2) == 7L && r2.getLong(4) == 7L && r2.isNullAt(5))
  }

  test("parkinsonVolOn: constant hourly activity has exactly zero volatility") {
    // 2 events in each of 3 hours on each of 4 days: H = L per day,
    // ln(H/L) = ln(1) = 0 exactly.
    val ev = (for {
      d <- 0 until 4; hh <- Seq(1, 9, 17); _ <- 1 to 2
    } yield ("T", f"2024-01-${d + 1}%02dT$hh%02d:30:00")).toDF("event_type", "ts")
    val got = graft.ops.Composite68.parkinsonVolOn(ev)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("T", 4L, 0.0)))
  }

  test("parkinsonVolOn: a 2:1 daily range scores sqrt(ln^2 2/(4 ln 2)) exactly") {
    // Every day: one hour with 2 events, one with 1 → ln(H/L) = ln 2,
    // σ = sqrt(n·ln²2 / (4·ln2·n)) = sqrt(ln2/4) = 0.416277.
    val ev = (for (d <- 0 until 5) yield Seq(
      ("T", f"2024-01-${d + 1}%02dT08:00:00"),
      ("T", f"2024-01-${d + 1}%02dT08:30:00"),
      ("T", f"2024-01-${d + 1}%02dT15:00:00"))).flatten
      .toDF("event_type", "ts")
    val got = graft.ops.Composite68.parkinsonVolOn(ev)
      .as[(String, Long, Double)].collect().head
    val expect = math.floor(math.sqrt(math.log(2.0) / 4) * 1e6 + 0.5) / 1e6
    assert(got._1 == "T" && got._2 == 5L && got._3 == expect, got.toString)
  }
}
