package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench bookkeeping invariants, enforced at `sbt test` time (the
  * requires in the Bench object body also fire on any bench run):
  * every headline query must be classified for the sf1 scale tier —
  * either eligible or excluded with a recorded reason (no silent
  * caps) — and must actually exist in the SparkEntry contract. */
class BenchBookkeepingSpec extends AnyFunSuite {

  test("headline = sf1Eligible ∪ sf1Excluded, disjointly") {
    // touching the object runs its init-time requires too
    val h = Bench.headline.toSet
    val e = Bench.sf1Eligible.toSet
    val x = Bench.sf1Excluded.keySet
    assert((e ++ x) == h, s"unclassified: ${h -- e -- x}; stray: ${(e ++ x) -- h}")
    assert(e.intersect(x).isEmpty, s"both eligible and excluded: ${e.intersect(x)}")
  }

  test("every headline query exists in the SparkEntry contract") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }

  test("no duplicate names in the bench lists") {
    assert(Bench.headline.distinct == Bench.headline)
    assert(Bench.sf1Eligible.distinct == Bench.sf1Eligible)
  }
}
