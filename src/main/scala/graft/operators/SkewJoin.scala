package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the manual skew-mitigation pattern
  * for when (a) the small side is too big to broadcast and (b) AQE's
  * skew-join split can't help (e.g. the skew is in the SHUFFLE, not in
  * post-shuffle partition sizes, or the join feeds a bucketed layout
  * that must not be re-split).
  *
  * The big (skewed) side gets a deterministic salt in [0, factor) from a
  * caller-chosen DISCRIMINATOR column — a column that varies within a
  * key group (a row id, an event id) — so one hot key's rows spread over
  * `factor` shuffle partitions. The small side replicates each row to
  * all `factor` salt values (size × factor — choose a factor that keeps
  * this manageable). The join is then a plain equi-join on
  * (key, salt): same result set as the unsalted join, because every
  * (big-row, small-row) key match meets at exactly the big row's salt.
  *
  * Salting is hash-deterministic (xxhash64 of the discriminator), so the
  * result is reproducible run-to-run and engine-independent — unlike a
  * rand()-salted join, it can be verified against an oracle.
  *
  * Reference parity: not in the reference (single-node engines don't
  * shuffle); part of the 100 TB operator surface.
  *
  * ==Salting vs AQE skew-join (when to use which)==
  * Spark's own `spark.sql.adaptive.skewJoin` (on by default in
  * [[graft.GraftSession]]) splits an oversized POST-SHUFFLE partition of
  * a sort-merge/shuffled-hash join at runtime and is the right default:
  * zero code, no small-side replication cost, and it sees actual sizes
  * instead of guessed factors — SkewJoinSpec's AQE gate pins that it
  * really fires on the 90%-hot fixture. Reach for [[saltedJoin]] only
  * when the runtime splitter structurally can't act: the skewed
  * exchange feeds an AGGREGATION or window (OptimizeSkewedJoin handles
  * joins only — splitting an agg's partition would break key
  * colocation), stream-static or stream-stream joins (no AQE in
  * micro-batch plans' stateful stages), a bucketed/pre-partitioned
  * layout that must not be re-split, or an engine/version with AQE off.
  * Salting also keeps the layout DETERMINISTIC (hash of a
  * discriminator), which the oracle-verified entries rely on — AQE's
  * split boundaries are size-dependent and run-varying.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `big(bigKey) = small(smallKey)`
    * with the big side salted by `discriminator`. Output columns:
    * big.* ++ small.* (minus the duplicate join key on the small side).
    *
    * `__salt`/`__sk` are reserved working names: either input carrying
    * them would collide with the salting plumbing, and an unqualified
    * key reference could bind across sides (e.g. a small side that also
    * has a `bigKey`-named column) — both are rejected up front and every
    * join-condition column is qualified by its DataFrame reference.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 discriminator: String, factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val reserved = Seq("__salt", "__sk")
    require(!reserved.exists(big.columns.contains) && !reserved.exists(small.columns.contains),
      s"input columns must not use the reserved names ${reserved.mkString(", ")}")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(factor.toLong)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
      .withColumnRenamed(smallKey, "__sk")
    salted
      .join(replicated,
        salted("__salt") === replicated("__salt") && salted(bigKey) === replicated("__sk"))
      .drop("__salt", "__sk")
  }
}
