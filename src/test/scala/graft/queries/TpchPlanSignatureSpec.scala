package graft.queries

import graft.{PlanSig, SparkSpec, SparkEntry}

/** Golden plan signatures for the TPC-H family (VERDICT r9 #4): pins,
  * per entry, the shuffle-exchange count, broadcast-exchange count, and
  * join-strategy multiset of the AQE FINAL plan at sf0.001 — so a lost
  * broadcast, a new exchange, or a strategy flip fails CI as a plan
  * regression instead of surfacing rounds later as a 2x bench entry.
  *
  * Counting rules live in ONE place — [[graft.PlanSig]] — shared with
  * the generator, and the extraction `collect()`s the DataFrame's own
  * QueryExecution so the AdaptiveSparkPlan is genuinely finalized
  * (review r10: a `.write` executes a separate QueryExecution and
  * silently pins the pre-adaptive plan). Node counts, not positions:
  * AQE may legally reorder/reuse stages, but it must not ADD exchanges
  * or lose broadcasts at fixed data sizes.
  *
  * Updating: regenerate with `Test/runMain PlanSigProbe` (same shared
  * session, same extraction; verified run-to-run stable). A diff here
  * must be argued in the commit that changes it: strictly fewer
  * exchanges or more broadcasts is an improvement; anything else is a
  * regression.
  */
class TpchPlanSignatureSpec extends SparkSpec {

  /** name -> (shuffle exchanges, broadcast exchanges, join multiset) */
  private val golden: Seq[(String, Int, Int, Map[String, Int])] = Seq(
    ("q31_tpch3_shape", 1, 2, Map("BroadcastHashJoin" -> 2)),
    ("q32_tpch6_shape", 1, 0, Map.empty),
    ("q33_correlated_subquery", 2, 1, Map("BroadcastHashJoin" -> 1)),
    ("q34_null_fns", 1, 0, Map.empty),
    ("q35_tpch5_shape", 1, 5, Map("BroadcastHashJoin" -> 5)),
    ("q36_tpch10_shape", 1, 3, Map("BroadcastHashJoin" -> 3)),
    ("q37_tpch12_shape", 2, 1, Map("BroadcastHashJoin" -> 1)),
    ("q38_tpch14_shape", 1, 1, Map("BroadcastHashJoin" -> 1)),
    ("q39_tpch4_shape", 2, 1, Map("BroadcastHashJoin" -> 1)),
    ("q40_tpch19_shape", 1, 1, Map("BroadcastHashJoin" -> 1)),
    ("q41_tpch1_shape", 2, 0, Map.empty),
    ("q42_tpch13_shape", 3, 1, Map("BroadcastHashJoin" -> 1)),
    ("q43_tpch7_shape", 2, 5, Map("BroadcastHashJoin" -> 5)),
    ("q44_tpch15_shape", 4, 2, Map("BroadcastHashJoin" -> 2)),
    ("q45_tpch17_shape", 3, 3, Map("BroadcastHashJoin" -> 3)),
    ("q46_tpch18_shape", 2, 2, Map("BroadcastHashJoin" -> 2)),
    ("q47_tpch2_shape", 2, 8, Map("BroadcastHashJoin" -> 8)),
    ("q48_tpch8_shape", 2, 7, Map("BroadcastHashJoin" -> 7)),
    ("q49_tpch9_shape", 2, 5, Map("BroadcastHashJoin" -> 5)),
    ("q50_tpch11_shape", 3, 5, Map("BroadcastHashJoin" -> 4, "BroadcastNestedLoopJoin" -> 1)),
    ("q51_tpch16_shape", 3, 2, Map("BroadcastHashJoin" -> 2)),
    ("q52_tpch20_shape", 2, 4, Map("BroadcastHashJoin" -> 4)),
    ("q53_tpch21_shape", 3, 5, Map("BroadcastHashJoin" -> 5)),
    // q54: BroadcastHashJoin=1 with bcast=0 — the broadcast arrives via
    // a ReusedExchange of an earlier stage's BroadcastExchange, which
    // the extraction deliberately does not double-count.
    ("q54_tpch22_shape", 3, 0, Map("BroadcastHashJoin" -> 1)))

  test("every TPC-H-family entry matches its golden plan signature (24 entries)") {
    assert(golden.map(_._1).toSet ==
      SparkEntry.allQueries.map(_.name).filter(_.matches("q(3[1-9]|4[0-9]|5[0-4])_.*")).toSet,
      "golden table must cover exactly the q31-q54 entries")
    val failures = golden.flatMap { case (name, wantShuffle, wantBcast, wantJoins) =>
      val df = SparkEntry.allQueries.find(_.name == name).get.run(spark, sfDir)
      val sig = PlanSig.of(df)
      val want = PlanSig.Sig(wantShuffle, wantBcast, wantJoins)
      if (sig == want) None
      else Some(s"$name: got $sig, want $want\n${PlanSig.finalPlanText(df).take(1500)}")
    }
    assert(failures.isEmpty, failures.mkString("\n\n"))
  }
}
