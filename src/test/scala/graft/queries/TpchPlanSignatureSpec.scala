package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Golden plan signatures for the TPC-H family (VERDICT r9 #4): pins,
  * per entry, the shuffle-exchange count, broadcast-exchange count, and
  * join-strategy multiset of the AQE FINAL plan at sf0.001 — so a lost
  * broadcast, a new exchange, or a strategy flip fails CI as a plan
  * regression instead of surfacing rounds later as a 2x bench entry.
  *
  * Counting rules: the executed AQE plan echoes its pre-adaptive form
  * under "== Initial Plan ==" — only the text BEFORE that marker is the
  * final plan (the UpsertSpec lesson). Node counts, not node positions:
  * AQE may legally reorder/reuse stages, but it must not ADD exchanges
  * or lose broadcasts at fixed data sizes.
  *
  * Updating: regenerate with `Test/runMain PlanSigProbe` (verified
  * run-to-run stable — AQE strategy choices at fixed testdata sizes and
  * thresholds are deterministic). A diff here must be argued in the
  * commit that changes it: strictly fewer exchanges or more broadcasts
  * is an improvement; anything else is a regression.
  */
class TpchPlanSignatureSpec extends SparkSpec {

  /** name -> (shuffle exchanges, broadcast exchanges, join multiset) */
  private val golden: Seq[(String, Int, Int, Map[String, Int])] = Seq(
    ("q31_tpch3_shape", 1, 2, Map("BroadcastHashJoin" -> 2)),
    ("q32_tpch6_shape", 1, 0, Map.empty),
    ("q33_correlated_subquery", 2, 1, Map("BroadcastHashJoin" -> 1)),
    ("q34_null_fns", 1, 0, Map.empty),
    ("q35_tpch5_shape", 2, 5, Map("BroadcastHashJoin" -> 5)),
    ("q36_tpch10_shape", 1, 3, Map("BroadcastHashJoin" -> 3)),
    ("q37_tpch12_shape", 2, 1, Map("BroadcastHashJoin" -> 1)),
    ("q38_tpch14_shape", 1, 1, Map("BroadcastHashJoin" -> 1)),
    ("q39_tpch4_shape", 2, 1, Map("BroadcastHashJoin" -> 1)),
    ("q40_tpch19_shape", 1, 1, Map("BroadcastHashJoin" -> 1)),
    ("q41_tpch1_shape", 2, 0, Map.empty),
    ("q42_tpch13_shape", 3, 1, Map("BroadcastHashJoin" -> 1)),
    ("q43_tpch7_shape", 2, 5, Map("BroadcastHashJoin" -> 5)),
    ("q44_tpch15_shape", 4, 2, Map("BroadcastHashJoin" -> 2)),
    ("q45_tpch17_shape", 3, 2, Map("BroadcastHashJoin" -> 2, "SortMergeJoin" -> 1)),
    ("q46_tpch18_shape", 2, 2, Map("BroadcastHashJoin" -> 2)),
    ("q47_tpch2_shape", 3, 7, Map("BroadcastHashJoin" -> 7, "SortMergeJoin" -> 1)),
    ("q48_tpch8_shape", 2, 7, Map("BroadcastHashJoin" -> 7)),
    ("q49_tpch9_shape", 2, 5, Map("BroadcastHashJoin" -> 5)),
    ("q50_tpch11_shape", 3, 5, Map("BroadcastHashJoin" -> 4, "BroadcastNestedLoopJoin" -> 1)),
    ("q51_tpch16_shape", 3, 2, Map("BroadcastHashJoin" -> 2)),
    ("q52_tpch20_shape", 2, 4, Map("BroadcastHashJoin" -> 4)),
    ("q53_tpch21_shape", 3, 4, Map("BroadcastHashJoin" -> 4, "SortMergeJoin" -> 1)),
    ("q54_tpch22_shape", 4, 1, Map("BroadcastHashJoin" -> 1)))

  private val joinKinds = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")

  test("every TPC-H-family entry matches its golden plan signature (24 entries)") {
    assert(golden.map(_._1).toSet ==
      SparkEntry.allQueries.map(_.name).filter(_.matches("q(3[1-9]|4[0-9]|5[0-4])_.*")).toSet,
      "golden table must cover exactly the q31-q54 entries")
    val failures = golden.flatMap { case (name, wantShuffle, wantBcast, wantJoins) =>
      val df = SparkEntry.allQueries.find(_.name == name).get.run(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      def n(re: String) = re.r.findAllIn(plan).size
      val shuffle = n("Exchange (hash|range)partitioning") + n("Exchange SinglePartition")
      val bcast = n("BroadcastExchange")
      val joins = joinKinds.map(k => k -> n(k)).filter(_._2 > 0).toMap
      if (shuffle == wantShuffle && bcast == wantBcast && joins == wantJoins) None
      else Some(s"$name: got shuffle=$shuffle bcast=$bcast joins=$joins, " +
        s"want shuffle=$wantShuffle bcast=$wantBcast joins=$wantJoins\n${plan.take(1500)}")
    }
    assert(failures.isEmpty, failures.mkString("\n\n"))
  }
}
