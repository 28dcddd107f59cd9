package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join, composed from built-ins (custom-operator
  * preference (a): no Catalyst surgery needed). For every left row,
  * attaches the value columns of the most recent right row with
  * `rightTs <= leftTs` for the same key.
  *
  * Mechanics: tag + union both sides, one window pass per key ordered by
  * (ts, side) with right rows sorting before left rows at equal
  * timestamps (inclusive semantics), carry right values forward with
  * IGNORE-NULLS `last`, keep left rows. Cost: ONE shuffle on the key —
  * no join explosion, no range-join quadratic blowup; at 100 TB this is
  * the sort-merge-friendly formulation.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightValCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightValCols.contains),
      s"right value columns ${rightValCols.mkString(",")} collide with left schema")

    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
        leftCols.map(col) ++
        rightValCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValCols.map(col): _*)

    val w = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValCols.map(col): _*)
  }
}
