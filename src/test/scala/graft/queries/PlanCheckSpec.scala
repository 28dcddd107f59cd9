package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Physical-plan assertions: the properties that matter at 100 TB —
  * predicate pushdown into the parquet scan, column pruning, broadcast
  * joins for dimension tables, TakeOrderedAndProject for top-k,
  * whole-stage codegen coverage — checked against the actual planned
  * queries so a regression in plan shape fails CI, not just a benchmark.
  */
class PlanCheckSpec extends SparkSpec {

  private def physicalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter is pushed down to the parquet scan") {
    val plan = physicalPlan("q02_filter")
    assert(plan.contains("PushedFilters: ["), plan.linesIterator.take(12).mkString("\n"))
    assert(plan.contains("GreaterThan(o_totalprice") || plan.contains("o_totalprice"),
      "price filter should reach the scan")
  }

  test("q01: scan reads only the projected columns") {
    val plan = physicalPlan("q01_scan")
    assert(plan.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"))
  }

  test("q03: dimension join is broadcast, not shuffled") {
    val plan = physicalPlan("q03_join_inner")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q04: multi-way join broadcasts both dims and pre-aggregates orders") {
    val plan = physicalPlan("q04_join_multi_agg")
    assert(plan.contains("BroadcastHashJoin"))
    // partial aggregation below the join: two HashAggregates for the
    // orders pre-agg plus the final r_name rollup
    assert("HashAggregate".r.findAllIn(plan).size >= 4)
  }

  test("q17: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = physicalPlan("q17_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q10: aggregation happens in whole-stage codegen with map-side combine") {
    val df = SparkEntry.queries("q10_agg_hash")(spark, sfDir)
    df.collect() // materialize the AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render as "*(n) Op" in the final AQE plan
    assert(plan.contains("*("), "expected whole-stage codegen spans")
    assert(plan.contains("partial_sum"), "expected map-side partial aggregation")
  }

  test("q26: cosine expression stays inside codegen (no UDF boundary)") {
    val df = SparkEntry.queries("q26_similarity_brute")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(plan.contains("cosine_similarity"))
  }
}
