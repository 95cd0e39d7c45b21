package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-coverage census — the BENCH_FULL twin of PlanShapeSpec's
  * OPERATORS.md census: every oracle query must be timed round over
  * round (or stand on a documented exclusion), so an implemented-but-
  * unbenched face can't drift out of the regression record silently
  * (the round-9 `q_hnsw_ann_batch` gap: oracle-green, headline-absent,
  * invisible to BENCH_DIFF).
  */
class BenchCensusSpec extends AnyFunSuite {

  /** Queries deliberately absent from the headline sweep. Empty today:
    * every SparkEntry query materializes a DataFrame, so every one is
    * benchable. A future entry here needs a reason in the comment
    * (error-path-only, streaming-only, oracle-audit-only) — the census
    * fails loudly otherwise.
    */
  private val excluded: Set[String] = Set.empty

  test("forward: every headline bench row is a real SparkEntry query") {
    val ghosts = Bench.headline.toSet.diff(SparkEntry.queries.keySet)
    assert(ghosts.isEmpty,
      s"Bench.headline names nonexistent queries: ${ghosts.toSeq.sorted}")
  }

  test("reverse: every SparkEntry query is benched (or excluded with cause)") {
    val unbenched = SparkEntry.queries.keySet
      .diff(Bench.headline.toSet).diff(excluded)
    assert(unbenched.isEmpty,
      "oracle queries missing from the bench census (add to " +
        s"Bench.headline or document an exclusion): ${unbenched.toSeq.sorted}")
  }

  test("exclusions stay real: no stale entries") {
    val stale = excluded.diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty,
      s"excluded names that are no longer queries: ${stale.toSeq.sorted}")
    val shadowed = excluded.intersect(Bench.headline.toSet)
    assert(shadowed.isEmpty,
      s"excluded names that ARE benched (drop the exclusion): ${shadowed.toSeq.sorted}")
  }

  test("headline has no duplicate rows") {
    val dups = Bench.headline.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate headline rows: ${dups.toSeq.sorted}")
  }
}
