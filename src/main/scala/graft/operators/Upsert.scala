package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert materialization / CDC compaction: collapse an append-only
  * change stream to the LATEST record per key — the batch half of the
  * reference's at-least-once ingestion story (replays and re-deliveries
  * append duplicates; downstream readers want one current row per key).
  *
  * Scale shape: ONE hash shuffle on the key columns; the window is
  * PARTITIONED per key, so every task ranks only its own keys' rows —
  * no global sort, no single-partition stage (the thing
  * [[GlobalRank]] exists to avoid does not arise here). Skewed keys are
  * the usual caveat: salt upstream ([[Layout.saltedJoin]] pattern) or
  * lean on AQE skew handling.
  */
object Upsert {

  /** One row per distinct `keys` combination: the first row under
    * `ordering` (pass descending columns for "latest"). The ordering
    * must be tie-free for deterministic output — include a unique
    * column (e.g. an event id) last.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "latestByKey needs at least one key column")
    require(ordering.nonEmpty, "latestByKey needs an ordering")
    require(!df.columns.contains("__rn"),
      "input must not already have a '__rn' column (it would be replaced and dropped)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Type-2 slowly-changing-dimension history from an append-only change
    * log: per key, suppress consecutive rows whose `attrCol` did not
    * change (null-safely — a null→value or value→null transition IS a
    * change), then interval-ize the surviving change rows with
    * `valid_to` = next change's `tsCol` (null = still current) and an
    * `is_current` flag. The other half of [[latestByKey]]: that keeps
    * only the present, this keeps the full auditable timeline a
    * dimension table replays.
    *
    * Output = input columns (minus the suppressed no-change rows) plus
    * `valid_to` (same type as `tsCol`) and `is_current`.
    *
    * Scale shape: both windows PARTITION BY the same keys with the same
    * ordering, and the second runs over a filter of the first, so
    * Catalyst plans ONE hash shuffle + one sort for the whole history
    * build (gated in UpsertSpec) — no global sort, no single-partition
    * stage. `tsCol` must be NON-NULL and `tsCol` + `tieBreak` tie-free
    * per key for deterministic output (include a unique id last, as in
    * [[latestByKey]]): a null `tsCol` would make the first-row
    * detection below misfire.
    */
  def scd2(df: DataFrame, keys: Seq[String], tsCol: String, attrCol: String,
           tieBreak: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    require(!df.columns.contains("__prev") && !df.columns.contains("__prev_ts"),
      "input must not already have '__prev'/'__prev_ts' columns (they would be replaced and dropped)")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol) +: tieBreak: _*)
    // __prev_ts distinguishes "no predecessor" (first version — always
    // kept, even with a null attr) from "predecessor had a null attr"
    // (kept only if the value changed) — lag(attrCol) alone conflates
    // the two when the first version's attr is null.
    df.withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .filter(col("__prev_ts").isNull || !(col("__prev") <=> col(attrCol)))
      .drop("__prev", "__prev_ts")
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** MERGE INTO semantics over a keyed snapshot: apply a change batch
    * carrying an op column ('U' upsert / 'D' delete) and produce the
    * next snapshot — matched U replaces the base row, unmatched U
    * inserts, D removes, base rows untouched by any change pass
    * through. The canonical lakehouse write path, expressed as ONE full
    * outer equi-join on the key (both sides shuffle once); callers with
    * multiple changes per key compact them first ([[latestByKey]]) —
    * enforced here by requiring op to be U/D per row, with duplicate
    * keys in `changes` rejected via a loud runtime check (a duplicate
    * would silently produce two versions of one key in the "snapshot").
    *
    * Output: the base schema (keys + valueCols).
    */
  def mergeInto(base: DataFrame, changes: DataFrame,
                keys: Seq[String], valueCols: Seq[String], opCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    require(valueCols.nonEmpty, "mergeInto needs at least one value column")
    // Same precondition style as the siblings (latestByKey's __rn,
    // scd2's __prev, snapshotDiff's collision require): a base column
    // named like a generated one would die later as an ambiguous
    // reference instead of a clear message.
    val generated = "__op" +: valueCols.map(c => s"__n_$c")
    val collisions = base.columns.toSeq.intersect(generated)
    require(collisions.isEmpty,
      s"base columns $collisions collide with mergeInto's generated columns — rename them")
    val n = changes.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__n_$c")) :+
        col(opCol).as("__op"): _*)
    // Guards ride the LIVE __op column as raise_error CASEs — a guard
    // on a column that is later dropped is dead code Catalyst prunes
    // away (measured: a dropped __dup check never fired). The dup check
    // pays one key-partitioned window over the CHANGE BATCH only, never
    // the base; the op check is a pure codegen'd CASE.
    val w = Window.partitionBy(keys.map(col): _*)
    val guarded = n
      .withColumn("__op", when(col("__op").isin("U", "D"), col("__op"))
        // coalesce: a NULL op would null-propagate through concat and
        // raise with an EMPTY message — the diagnostic must survive
        .otherwise(raise_error(concat(lit(s"mergeInto: op must be 'U' or 'D', got "),
          coalesce(col("__op").cast("string"), lit("NULL"))))))
      .withColumn("__op", when(count(lit(1)).over(w) === 1, col("__op"))
        .otherwise(raise_error(lit("mergeInto: duplicate key in changes — compact with latestByKey first"))))
    base.join(guarded, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(keys.map(col) ++ valueCols.map(c =>
        when(col("__op") === "U", col(s"__n_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Snapshot diff: classify every key across two table versions as
    * `added` (new only), `removed` (old only), or `changed` (present in
    * both with any compare column differing, null-safely) — the
    * change-data-feed a lakehouse derives between versions when no
    * change log was captured. `unchanged` keys are dropped (at 100 TB
    * they are the overwhelming bulk; emitting them would turn a diff
    * into a copy).
    *
    * ONE full outer equi-join on the key — both sides shuffle once on
    * the key columns; comparisons are codegen'd null-safe equality.
    * Keys must be unique per snapshot (it is a diff of keyed versions,
    * not a multiset diff); enforce upstream with [[latestByKey]].
    * Output: keys*, old_<c>/new_<c> per compare column, then
    * change ('added'|'removed'|'changed') last.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    val generated = compareCols.flatMap(c => Seq(s"old_$c", s"new_$c")) ++
      Seq("change", "__po", "__pn")
    val collisions = keys.intersect(generated)
    require(collisions.isEmpty,
      s"key columns $collisions collide with generated output columns — rename the keys")
    // __present markers distinguish a missing row from a row of nulls
    // (a key whose compare columns are all null is still PRESENT).
    val o = oldSnap.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__po"): _*)
    val n = newSnap.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__pn"): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change").isNotNull)
      .drop("__po", "__pn")
  }
}
