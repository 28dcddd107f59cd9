package graft.queries

import graft.{PlanSig, SparkEntry, SparkSpec}

/** Golden plan signatures for the round-13 session-2 entries whose
  * returned plan is live Catalyst (q55/q56/ct01/up04 — the other six
  * entries of the batch return working-set-materialized results that
  * bottom out at a checkpoint scan, so they have no signature to pin;
  * their plan properties are gated in their operator specs instead).
  * Same rules as [[TpchPlanSignatureSpec]]: counts of the AQE FINAL
  * plan at sf0.001; regenerate with `Test/runMain graft.NewEntrySigProbe`
  * and argue any diff in the changing commit.
  *
  * What each pin protects:
  *   - q55_pivot: TWO aggregate levels ((priority, status) partial +
  *     pivotfirst) + the presentation sort = 3 exchanges, no join — a
  *     4th exchange means pivot stopped planning as one aggregate
  *     chain.
  *   - q56_unpivot: aggregate + sort only — the Expand must stay
  *     shuffle-free.
  *   - ct01_cohort_retention: the first-day aggregate must BROADCAST
  *     into the activity join (losing it adds a shuffled join on the
  *     user key).
  *   - up04_snapshot_diff: a full outer join cannot broadcast — the
  *     pin is exactly one SortMergeJoin and no extra exchanges.
  */
class NewEntryPlanSignatureSpec extends SparkSpec {

  private val golden: Seq[(String, Int, Int, Map[String, Int])] = Seq(
    ("q55_pivot", 3, 0, Map.empty),
    ("q56_unpivot", 2, 0, Map.empty),
    ("ct01_cohort_retention", 5, 1, Map("BroadcastHashJoin" -> 1)),
    ("up04_snapshot_diff", 3, 0, Map("SortMergeJoin" -> 1)))

  test("session-2 entries match their golden plan signatures") {
    assert(golden.map(_._1) == graft.NewEntrySigProbe.Names,
      "golden table and its generator must cover the same entries")
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
