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

  test("q41: single-pass scan with map-side partial aggregation and pushdown") {
    val plan = physicalPlan("q41_tpch1_shape")
    assert(plan.contains("PushedFilters: ["), "shipdate bound must reach the scan")
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      "six aggregates must combine map-side")
    assert("Scan parquet".r.findAllIn(plan).size == 1, "Q1 is one pass over lineitem")
  }

  test("q43: nation dims broadcast; the snowflake join has no cartesian") {
    val plan = physicalPlan("q43_tpch7_shape")
    assert(plan.contains("BroadcastHashJoin"), "nation joins must broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q47: the correlated MIN decorrelates to an aggregate below a join") {
    // TPC-H Q2's correlated scalar subquery must NOT execute per-row:
    // Catalyst rewrites it into a MIN aggregate grouped on the
    // correlation key (ps_partkey) joined back to the outer query. The
    // optimized plan therefore contains an Aggregate inside a Join
    // subtree and no per-row subquery expression survives.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val optimized = SparkEntry.queries("q47_tpch2_shape")(spark, sfDir)
      .queryExecution.optimizedPlan
    assert(!optimized.toString.contains("scalar-subquery"),
      "correlated scalar subquery must be decorrelated, not evaluated per row")
    val joins = optimized.collect { case j: Join => j }
    assert(joins.exists(j => (j.left.collectFirst { case a: Aggregate => a })
        .orElse(j.right.collectFirst { case a: Aggregate => a }).isDefined),
      "the MIN(ps_supplycost) aggregate must sit below the join back to parts")
  }

  test("q52: the nested IN + correlated SUM plans as joins, no per-row subquery") {
    // TPC-H Q20's shape: IN -> left semi join; the correlated SUM ->
    // an aggregate on the (partkey, suppkey) correlation key joined to
    // partsupp. Nothing here may remain a per-row subquery or turn into
    // a cartesian product.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.{LeftSemi}
    val optimized = SparkEntry.queries("q52_tpch20_shape")(spark, sfDir)
      .queryExecution.optimizedPlan
    val s = optimized.toString
    assert(!s.contains("scalar-subquery") && !s.contains("list-subquery"),
      "IN and the correlated SUM must both decorrelate")
    assert(!s.contains("Cartesian"))
    val joins = optimized.collect { case j: Join => j }
    assert(joins.exists(_.joinType == LeftSemi), "IN must plan as a left semi join")
    assert(joins.exists(j => (j.left.collectFirst { case a: Aggregate => a })
        .orElse(j.right.collectFirst { case a: Aggregate => a }).isDefined),
      "the shipped-quantity SUM must aggregate below a join")
  }

  test("q53: both EXISTS rewrite to semi/anti joins over the fact table") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val optimized = SparkEntry.queries("q53_tpch21_shape")(spark, sfDir)
      .queryExecution.optimizedPlan
    val joins = optimized.collect { case j: Join => j }
    assert(joins.exists(_.joinType == LeftSemi), "EXISTS must plan as left semi")
    assert(joins.exists(_.joinType == LeftAnti), "NOT EXISTS must plan as left anti")
    assert(!optimized.toString.contains("Cartesian"))
  }

  test("q46: the HAVING aggregate prunes before the dimension joins") {
    // Structural assertion on the optimized logical plan: some join must
    // have the quantity Aggregate INSIDE one of its subtrees — lineitem
    // rolls up and filters first, then qualifying orders join. A plan
    // that joined the raw fact table before aggregating would have every
    // Aggregate strictly ABOVE every Join and fail here.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val optimized = SparkEntry.queries("q46_tpch18_shape")(spark, sfDir)
      .queryExecution.optimizedPlan
    val joins = optimized.collect { case j: Join => j }
    assert(joins.nonEmpty, s"expected joins in:\n${optimized.toString.take(400)}")
    assert(joins.exists(j => (j.left.collectFirst { case a: Aggregate => a })
        .orElse(j.right.collectFirst { case a: Aggregate => a }).isDefined),
      "the quantity rollup must sit BELOW a join, not above all of them")
    assert(!optimized.toString.contains("Cartesian"))
  }

  test("ta07: LM scoring is pure built-ins with partial counts, no UDF boundary") {
    // Lazy mode so the full plan is inspectable: in the default eager
    // mode bigramNll checkpoints its result (corpus scanned once, not
    // three times) and the executed plan collapses to an RDD scan.
    spark.conf.set(graft.operators.TextDedup.MaterializeConf, "none")
    val df = try SparkEntry.queries("ta07_bigram_nll")(spark, sfDir)
    finally spark.conf.unset(graft.operators.TextDedup.MaterializeConf)
    df.collect() // materialize the AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "ln/floor/joins must stay codegen'd column arithmetic")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      "unigram/bigram counts must combine map-side")
    assert(!plan.contains("Cartesian"), "count-table joins are equi-joins")
  }

  test("q13_cube: all 2^k grouping sets come from ONE Expand over ONE scan") {
    val plan = physicalPlan("q13_cube")
    assert("Expand".r.findAllIn(plan).size == 1,
      "CUBE must expand once, not re-scan per grouping set")
    assert("Scan parquet".r.findAllIn(plan).size == 1)
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      "expanded rows must combine map-side")
  }

  test("hl01: sketches build as partial aggregates (mergeable pre-aggregation)") {
    val plan = physicalPlan("hl01_sketch_union")
    assert(plan.contains("partial_hll_sketch_agg"),
      "per-group sketches must build map-side — that IS the mergeable-sketch pattern")
    assert("Scan parquet".r.findAllIn(plan).size <= 2,
      "sketch chain + exact cross-check: at most two passes over events")
  }

  test("fn01: every funnel stage joins on the user key — no cartesian stage") {
    val plan = physicalPlan("fn01_funnel")
    assert(!plan.contains("CartesianProduct"),
      "stage joins must be user_id equi-joins (the 1-row count combines broadcast)")
  }

  test("tp06: quotas join broadcast; the data pays one stratum-keyed window") {
    val df = SparkEntry.queries("tp06_mixture_sample")(spark, sfDir)
    df.collect() // materialize the AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the per-stratum quota table is tiny and must broadcast onto the ranked rows")
    assert(plan.contains("Window"), "per-stratum md5-order ranking")
    assert(!plan.contains("CartesianProduct"))
  }

  test("tp07: weighted top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = physicalPlan("tp07_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      "the E-S draw must take per-partition heaps, never sort the corpus")
  }

  test("bf01: the exact semi join broadcasts; the Bloom probe rides the scan side") {
    val df = SparkEntry.queries("bf01_bloom_semi_join")(spark, sfDir)
    df.collect() // materialize the AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "false-positive removal is an exact semi join")
    assert(plan.contains("UDF") || plan.contains("ScalaUDF"),
      "the Bloom membership probe (declared UDF) must appear as a pre-join filter")
    assert(!plan.contains("CartesianProduct"))
  }
}
