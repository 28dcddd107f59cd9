package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compactLeaf merges many small files and preserves the data exactly") {
    val dir = tmpDir("compact-leaf")
    val df = spark.range(10000).select(col("id"), (col("id") % 97).as("k"))
    df.repartition(40).write.mode("overwrite").parquet(dir)

    val stats = Compaction.compactLeaf(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(stats.compacted && stats.filesBefore == 40 && stats.filesAfter == 1,
      s"expected 40 -> 1 files, got $stats")

    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 10000L).sum)
  }

  test("compactLeaf is a no-op when the directory is already compact") {
    val dir = tmpDir("compact-noop")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = Compaction.compactLeaf(spark, dir)
    assert(!stats.compacted && stats.filesAfter == stats.filesBefore)
  }

  test("compactPartitioned compacts every leaf of an ingest-style layout") {
    val root = tmpDir("compact-tree")
    val df = spark.range(4000).select(col("id"),
      (col("id") % 2).as("y"), (col("id") % 3).as("m"))
    df.repartition(12).write.mode("overwrite").partitionBy("y", "m").parquet(root)

    val before = Compaction.compactPartitioned(spark, root, targetFileBytes = 64L * 1024 * 1024)
    assert(before.nonEmpty && before.forall(_.filesAfter == 1),
      s"every leaf should compact to one file: $before")
    val back = spark.read.parquet(root)
    assert(back.count() == 4000)
    assert(back.select(countDistinct("id")).head.getLong(0) == 4000)
  }
}
