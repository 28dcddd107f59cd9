package graft

import org.apache.spark.sql.DataFrame

/** Shared plan-signature extraction for the golden TPC-H gate and its
  * generator (PlanSigProbe) — ONE definition of what is counted, so the
  * table and the checker cannot drift apart (review r10).
  *
  * `collect()` runs the DataFrame's OWN QueryExecution, which is what
  * finalizes its AdaptiveSparkPlan — a `.write` would execute a
  * separate QueryExecution and leave `df.queryExecution.executedPlan`
  * unexecuted (isFinalPlan=false), silently pinning the pre-adaptive
  * plan (review r10; the UpsertSpec precedent). The final plan's
  * string echoes the pre-adaptive form under "== Initial Plan ==";
  * only the text before that marker is counted.
  */
object PlanSig {
  final case class Sig(shuffle: Int, bcast: Int, joins: Map[String, Int]) {
    override def toString: String = {
      val js = joins.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
      s"shuffle=$shuffle bcast=$bcast joins=[$js]"
    }
  }

  val JoinKinds: Seq[String] = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")

  def of(df: DataFrame): Sig = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    def n(re: String) = re.r.findAllIn(plan).size
    Sig(
      shuffle = n("Exchange (hash|range)partitioning") + n("Exchange SinglePartition"),
      bcast = n("BroadcastExchange"),
      joins = JoinKinds.map(k => k -> n(k)).filter(_._2 > 0).toMap)
  }

  /** The final-plan text itself (for failure messages). */
  def finalPlanText(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
}
