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

  test("compactLeaf(sortBy) preserves disjoint per-file key ranges") {
    // A clustered table compacted with the default round-robin rewrite
    // loses its min/max locality; sortBy must keep output files on
    // DISJOINT key ranges (the property parquet row-group skipping
    // needs). Fixture: a key-sorted 64-file layout, compacted 64 -> 4.
    val dir = tmpDir("compact-sorted")
    spark.range(100000).select(col("id").as("zkey"), (col("id") % 7).as("v"))
      .repartitionByRange(64, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val stats = Compaction.compactLeaf(spark, dir,
      targetFileBytes = bytes / 4 + 1, sortBy = Seq("zkey"))
    assert(stats.compacted && stats.filesBefore == 64 && stats.filesAfter <= 5,
      s"expected 64 -> ~4 files, got $stats")
    // per-file [min, max] ranges must not overlap
    val ranges = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("zkey"))
      .groupBy("f").agg(min("zkey").as("lo"), max("zkey").as("hi"))
      .orderBy("lo").as[(String, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2,
        s"overlapping compacted ranges: ${a._1} [${a._2},${a._3}] vs ${b._1} [${b._2},${b._3}]")
      case _ => ()
    }
    assert(spark.read.parquet(dir).count() == 100000)
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
