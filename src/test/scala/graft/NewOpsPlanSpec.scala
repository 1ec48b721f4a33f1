package graft

/** Plan-shape guards for the late-round training-data operators —
  * the properties PLANS.md evidences, pinned as regressions. String
  * checks over the executed plan (like the sibling PlanSpec): the
  * interesting nodes sit inside AQE query stages and the persisted
  * relation's cached plan, which the string includes and typed
  * traversal does not. */
class NewOpsPlanSpec extends SparkSpec {

  private def finalized(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q_pack: every window is partition-keyed — no single-task global scan") {
    val s = finalized("q_pack")
    val specs = "windowspecdefinition\\(".r.findAllIn(s).length
    val keyed = "windowspecdefinition\\(_part".r.findAllIn(s).length
    assert(specs > 0, "expected the per-partition cumsum window in:\n" + s.take(1500))
    assert(specs == keyed,
      s"$keyed of $specs windows are partition-keyed — a global window crept in:\n" +
        s.take(1500))
  }

  test("q_decon: the eval slice is the broadcast build side") {
    val s = finalized("q_decon")
    assert(s.contains("BroadcastHashJoin"),
      "expected a broadcast hash join for the gram probe:\n" + s.take(1500))
    val i = s.indexOf("BroadcastExchange")
    assert(i >= 0, s.take(1500))
    // the subtree under the exchange is printed after it: it must be
    // the doc_id % 11 = 0 slice (the corpus side carries NOT(...))
    val bcastSubtree = s.substring(i)
    assert(bcastSubtree.contains("% 11) = 0") && !bcastSubtree.contains("NOT (("),
      "broadcast side is not the eval slice:\n" + bcastSubtree.take(1200))
  }
}
