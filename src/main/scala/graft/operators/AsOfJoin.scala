package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward / forward / nearest), composed from built-ins
  * (custom-operator preference (a): no Catalyst surgery needed). For
  * every left row, attaches the value columns of the matching right row
  * for the same key:
  *
  *   - backward: most recent right row with `rightTs <= leftTs`
  *   - forward:  earliest right row with `rightTs >= leftTs`
  *   - nearest:  whichever of the two is closer in time (ties →
  *     backward, matching the pandas `merge_asof` convention)
  *
  * Mechanics: tag + union both sides, one window pass per key ordered
  * by (ts, side) with the right side positioned so the inclusive bound
  * falls inside the frame, then IGNORE-NULLS `last`/`first` carries the
  * right values to each left row. Cost: ONE shuffle on the key — no
  * join explosion, no range-join quadratic blowup; at 100 TB this is
  * the sort-merge-friendly formulation.
  */
object AsOfJoin {

  private def tagged(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     rightValCols: Seq[String],
                     leftSide: Int, rightSide: Int): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightValCols.contains),
      s"right value columns ${rightValCols.mkString(",")} collide with left schema")
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"),
        lit(null).cast(right.schema(rightTs).dataType).as("__rts")) ++
        leftCols.map(col) ++
        rightValCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(rightSide))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"),
        col(rightTs).as("__rts")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValCols.map(col): _*)
    (lTagged.unionByName(rTagged), leftCols)
  }

  /** Most recent right row with `rightTs <= leftTs`. */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightValCols: Seq[String]): DataFrame = {
    // right sorts BEFORE left at equal ts ⇒ the inclusive <= bound is
    // inside the trailing frame
    val (u, leftCols) = tagged(left, right, key, leftTs, rightTs, rightValCols,
      leftSide = 1, rightSide = 0)
    val w = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValCols.map(col): _*)
  }

  /** Earliest right row with `rightTs >= leftTs`. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightValCols: Seq[String]): DataFrame = {
    // left sorts BEFORE right at equal ts ⇒ the inclusive >= bound is
    // inside the leading frame
    val (u, leftCols) = tagged(left, right, key, leftTs, rightTs, rightValCols,
      leftSide = 0, rightSide = 1)
    val w = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = rightValCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++ rightValCols.map(col): _*)
  }

  /** Closest right row in either direction; exact ties go backward
    * (pandas `merge_asof(direction="nearest")` convention). Still one
    * shuffle: both directional passes share the (key, ts, side) sort.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightValCols: Seq[String]): DataFrame = {
    // right-before-left ordering: the trailing frame sees <= (inclusive);
    // the leading frame sees strictly > — the equal-ts case is correctly
    // claimed by backward, which also wins the tie by convention.
    val (u, leftCols) = tagged(left, right, key, leftTs, rightTs, rightValCols,
      leftSide = 1, rightSide = 0)
    val wb = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withBoth = rightValCols.foldLeft(
      u.withColumn("__bts", last(col("__rts"), ignoreNulls = true).over(wb))
        .withColumn("__fts", first(col("__rts"), ignoreNulls = true).over(wf))) { (df, c) =>
      df.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wb))
        .withColumn(s"__f_$c", first(col(c), ignoreNulls = true).over(wf))
    }
    val backWins = col("__fts").isNull ||
      (col("__bts").isNotNull &&
        (col("__ts").cast("double") - col("__bts").cast("double")) <=
          (col("__fts").cast("double") - col("__ts").cast("double")))
    val picked = rightValCols.foldLeft(withBoth) { (df, c) =>
      df.withColumn(c, when(backWins, col(s"__b_$c")).otherwise(col(s"__f_$c")))
    }
    picked.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValCols.map(col): _*)
  }
}
