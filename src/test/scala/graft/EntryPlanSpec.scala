package graft

import org.apache.spark.sql.execution.SparkPlan

class EntrySpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001") {
    // (oracle-key/query consistency is RegistrySpec's job)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}

/** Plan-shape guards: the properties that matter at 100 TB. */
class PlanSpec extends SparkSpec {
  private def executed(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan
  }

  test("q06 pushes filters and prunes columns at the parquet scan") {
    val s = executed("q06_filter_agg").toString
    assert(s.contains("PushedFilters: ["), s)
    assert(s.contains("l_shipdate"), "shipdate filter not pushed")
    // projection pruned to the referenced columns only
    assert(!s.contains("l_orderkey"), "scan reads unneeded columns")
  }

  test("q_filter_min_obs pushes the value predicate to the scan") {
    val s = executed("q_filter_min_obs").toString
    assert(s.contains("PushedFilters: [") && s.contains("GreaterThanOrEqual(value,10"), s.take(1200))
  }

  test("q01 scan reads only the referenced columns") {
    val s = executed("q01_pricing_summary").toString
    val scan = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    Seq("l_quantity", "l_returnflag", "l_shipdate")
      .foreach(c => assert(scan.contains(c), s"$c missing from scan: $scan"))
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_tax")
      .foreach(c => assert(!scan.contains(c), s"$c should be pruned: $scan"))
  }

  test("q05 broadcasts the dimension sides") {
    val s = executed("q05_local_supplier").toString
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
  }

  test("movement pipeline shuffles once (windows share the partitioning)") {
    val s = executed("q_movement").toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges")
  }

  test("as-of join composes as a single-shuffle union+window") {
    val df = SparkEntry.queries("q_asof_join")(spark, sfDir)
    df.collect() // finalize THIS df's adaptive plan
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges == 1, s"expected 1 shuffle for the as-of union+window, got $exchanges:\n" +
      s.take(1200))
  }

  test("posting kernel: pair generation is a grouped expansion, not a self-join") {
    // jaccard/winnow/minhash/simhash all route pair generation through
    // the single-shuffle Postings shape: no SortMergeJoin/ShuffledHashJoin
    // on the posting KEY anywhere (the sizes join-backs key on doc ids),
    // and simhash needs no distinct after its first-agreeing-band filter
    for (q <- Seq("q_jaccard_pairs", "q_winnow_containment", "q_simhash_pairs")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!s.contains("shingle#") || !s.contains("SortMergeJoin [shingle"),
        s"$q still self-joins on shingle")
      assert(!s.contains("SortMergeJoin [fp"), s"$q still self-joins on fp")
      assert(!s.contains("SortMergeJoin [bv") && !s.contains("SortMergeJoin [band"),
        s"$q still self-joins on band")
    }
    val sh = SparkEntry.queries("q_simhash_pairs")(spark, sfDir)
    sh.collect()
    val s2 = sh.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!s2.contains("HashAggregate(keys=[d1"),
      "simhash pairs should need no distinct after the first-band filter:\n" + s2.take(1500))
  }

  test("track split cogroups by video with one exchange per input side") {
    val df = SparkEntry.queries("q_track_split")(spark, sfDir)
    df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(s.contains("CoGroup"), "expected a CoGroup plan:\n" + s.take(1200))
    // lineage windows share one uid exchange; each cogroup side adds one
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges <= 4, s"expected <= 4 shuffles, got $exchanges")
  }

  test("stratified sampling plans as broadcast join + filter, no shuffle") {
    val df = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
    df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoopJoin"),
      s.take(1200))
    assert(!s.contains("Exchange hashpartitioning"),
      "sampling must stay map-only + broadcast:\n" + s.take(1200))
  }

  test("wavelet pipeline: one scan, one shuffle, codegen in the hot path") {
    val df = SparkEntry.queries("q_ts_wavelet")(spark, sfDir)
    df.collect() // finalize THIS df's adaptive plan (count() builds a new one)
    // the adaptive toString appends "== Initial Plan ==" after the final plan
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(s).length == 1, "scan duplicated")
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 1,
      "expected a single shuffle")
    // codegen'd operators carry the "*(n)" stage marker in the final plan
    assert(s.contains("*("), s.take(1500))
  }
}
