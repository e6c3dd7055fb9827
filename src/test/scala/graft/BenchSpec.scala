package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's steal-reaction logic (round-7 verdict item #1), proven on
  * synthetic observations — no Spark needed: `allContaminated` is the
  * bounded-retry trigger, `bestObservation` the selection rule. Together
  * they guarantee a query whose every round-robin run was steal-inflated
  * gets re-run and its reported minimum comes from the quietest
  * observation available. */
class BenchSpec extends AnyFunSuite {

  test("retry triggers only when EVERY run saw nonzero steal") {
    assert(Bench.allContaminated(Seq((5.0, 120L), (4.8, 30L), (5.2, 7L))))
    assert(!Bench.allContaminated(Seq((5.0, 120L), (4.1, 0L), (5.2, 7L))),
      "one quiet run means the min is already trustworthy — no retry")
    assert(!Bench.allContaminated(Nil), "a failed query must not retry-loop")
  }

  test("the -1 'steal unobservable' sentinel never triggers a retry") {
    assert(!Bench.allContaminated(Seq((5.0, -1L), (4.8, -1L))),
      "-1 means /proc/stat is absent, not 'contaminated' — retrying would loop blind")
  }

  test("a contaminated observation is replaced by the quiet retry") {
    // the r7 scale10 scenario: one 19.5×-looking run under a steal burst,
    // then a quiet retry — the kept observation must be the retry (steal
    // can only inflate a run, so minimum time IS the quietest estimate)
    val contaminated = (19.5, 223L)
    val quietRetry = (2.1, 0L)
    assert(Bench.bestObservation(Seq(contaminated, quietRetry)) == quietRetry)
    // and once the quiet run is recorded, the trigger clears (bounded loop)
    assert(!Bench.allContaminated(Seq(contaminated, quietRetry)))
  }

  test("retry loop terminates: trigger is monotone in appended observations") {
    // appending observations can only keep or clear the trigger, never
    // re-arm it — the while(tries < max && allContaminated) loop is thus
    // bounded by max even if every retry lands under steal
    val runs = Seq((5.0, 50L), (5.5, 80L))
    assert(Bench.allContaminated(runs))
    assert(Bench.allContaminated(runs :+ ((5.2, 60L))))
    assert(!Bench.allContaminated(runs :+ ((4.9, 0L))))
    assert(!Bench.allContaminated(runs :+ ((4.9, 0L)) :+ ((5.8, 90L))),
      "a later contaminated run must not re-arm the trigger")
  }
}
