package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 batch 4 (SURVEY §2.88): planted cases for the Cronbach-α
  * / ICC(1,1) reliability row.
  */
class Round55Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def plant(rows: Seq[(String, Int, Int)]) = // (type, day, count)
    rows.flatMap { case (t, day, y) =>
      Seq.fill(y)((t, java.time.LocalDate.of(2024, 1, 1)
        .plusDays(day.toLong - 1).toString))
    }.toDF("event_type", "ts")

  test("cronbachIccOn: items moving in lockstep score alpha = 1 and ICC = 1") {
    // Day d: every one of the 5 types fires d times — each item's
    // scaled variance is 20, the total's 500 = 25·20, so
    // alpha = (5/4)(1 − 100/500) = 1; within-day variance is 0 so
    // ICC(1,1) = 1.
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = plant(for (t <- types; d <- 1 to 4) yield (t, d, d))
    val got = graft.ops.Composite75.cronbachIccOn(ev)
      .as[(Long, Double, Double)].collect().head
    assert(got == ((4L, 1.0, 1.0)))
  }

  test("cronbachIccOn: anti-correlated pair NULLs alpha (zero total variance), ICC = -0.25") {
    // click = [1,2], view = [2,1], others structurally 0: row sums
    // are constant -> V_tot = 0 -> alpha NULL by the nullif guard;
    // one-way ANOVA: MSB = 0, MSW = 0.8 -> ICC = -0.25 (days
    // indistinguishable, all variance within).
    val ev = plant(Seq(("click", 1, 1), ("click", 2, 2),
      ("view", 1, 2), ("view", 2, 1)))
    val got = graft.ops.Composite75.cronbachIccOn(ev).collect().head
    assert(got.getLong(0) == 2L)
    assert(got.isNullAt(1), s"alpha not NULL: $got")
    assert(got.getDouble(2) == -0.25)
  }
}
