package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema evolution across ingest batches — the long-lived-pipeline
  * concern the fixed-schema happy path hides: producers ADD columns
  * mid-stream, and both the write path and the read path must keep
  * working without rewriting history.
  *
  * Two halves:
  *  - [[readMerged]]: read a directory whose parquet batches carry
  *    DIFFERENT (compatible) schemas as one DataFrame — Spark's
  *    per-file `mergeSchema` union-by-name; rows from pre-evolution
  *    batches surface NULL for later-added columns. Schema merging is
  *    per-footer work at planning time — the data itself is never
  *    rewritten, which is the only behavior that scales: a 100 TB
  *    history cannot be migrated to every producer schema bump.
  *  - [[conform]]: align one incoming batch to a declared target
  *    schema before it is written — missing nullable columns filled
  *    with NULL, compatible types UP-cast (int→long, float→double),
  *    and anything lossy or unknown rejected LOUDLY (silent narrowing
  *    casts are how corrupt warehouses happen).
  */
object SchemaDrift {

  /** Union-by-name read over evolving parquet batches under `root`.
    * `recursiveFileLookup` lists every batch dir without inferring
    * partition columns from the directory names. */
  def readMerged(spark: SparkSession, root: String): DataFrame =
    spark.read
      .option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(root)

  /** Align `df` to `target`: project target columns in order, filling
    * absent nullable columns with NULL and up-casting compatible types.
    * Fails loudly on extra columns (unless `dropExtra`), on a missing
    * NON-nullable column, and on any cast Spark cannot prove lossless
    * (`Cast.canUpCast`). */
  def conform(df: DataFrame, target: StructType,
              dropExtra: Boolean = false): DataFrame = {
    val extras = df.columns.filterNot(target.fieldNames.contains)
    require(dropExtra || extras.isEmpty,
      s"batch carries column(s) not in the target schema: ${extras.mkString(", ")} " +
        "— evolve the target first, or pass dropExtra=true to discard them")
    val cols = target.fields.map { f =>
      if (df.columns.contains(f.name)) {
        val from = df.schema(f.name).dataType
        if (from == f.dataType) col(f.name)
        else {
          require(
            org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, f.dataType),
            s"column '${f.name}' is $from but the target wants ${f.dataType} — " +
              "not a lossless up-cast; transform explicitly")
          col(f.name).cast(f.dataType).as(f.name)
        }
      } else {
        require(f.nullable,
          s"batch is missing NON-nullable target column '${f.name}'")
        lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
