package graft

/** The plan-shape GATE: every [[PlanCheck]] assertion (pushdown,
  * broadcast-vs-SMJ, no cartesian/BNLJ, exchange and scan budgets,
  * TakeOrderedAndProject) runs inside `sbt test`, so a dropped hint or
  * a new exchange fails the build instead of surfacing rounds later as
  * a bench regression. Same sf0.01 data and session shape the
  * standalone `runMain graft.PlanCheck` inspection uses. */
class PlanCheckSpec extends GraftSpec {

  test("every physical-plan assertion holds at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val results = PlanCheck.runAll(spark, dir)
    // the check set only ever grows — a silent shrink (a renamed query
    // dropping its checks) must fail too
    assert(results.size >= 135,
      s"plan-check set shrank to ${results.size} (expected >= 135)")
    val bad = results.filterNot(_.ok)
    assert(bad.isEmpty,
      s"${bad.size} plan checks failed:\n" +
        bad.map(r => s"  ${r.query}: ${r.detail.linesIterator.toSeq.headOption.getOrElse("")}")
          .mkString("\n"))
  }
}
