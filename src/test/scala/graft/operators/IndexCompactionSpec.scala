package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ix01 (r18 directive #2): every nightly append lifecycle
  * parquet-appends batch-sized files into its index partitions, so
  * after N nights probe-side scan cost degrades with file count. Each
  * family's `compact*` composes `Compaction` with the witness/meta
  * discipline. The gates, per family: file counts DROP, search answers
  * are HASH-IDENTICAL pre/post (content untouched — only layout), the
  * re-blessed witness admits later appends/searches, an already-compact
  * index is a no-op, and a STALE index refuses compaction loudly
  * (compacting an inconsistency would rewrite it into "clean" files).
  * The band indexes (dhash/afp/dd11 via Layout.saveBucketedPath) have
  * no append lifecycle — save-once, bucketed — so there is nothing to
  * compact there by construction.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Long = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.filter(p => java.nio.file.Files.isRegularFile(p) &&
      p.getFileName.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  test("compactPqIndex: appends accrete files; compaction drops them, search identical") {
    val e = tables.embeddings.select("vec_id", "embedding")
    val path = tmpDir("pq-compact")
    ProductQuantizer.savePqIndex(e.filter(col("vec_id") % 10 >= 4),
      d = 64, m = 4, k = 4, iterations = 2, path = path)
    (0 to 3).foreach { n => // four "nights"
      ProductQuantizer.appendToPqIndex(e.filter(col("vec_id") % 10 === n), path)
    }
    val probe = e.filter(col("vec_id") === 1L)
    val before = ProductQuantizer.adcTopKIndexed(probe, path, topK = 10)
      .as[(Long, Long)].collect().toSeq
    val stats = ProductQuantizer.compactPqIndex(spark, path)
    assert(stats.compacted && stats.filesAfter < stats.filesBefore,
      s"expected a real compaction, got $stats")
    assert(parquetFiles(s"$path/codes") == stats.filesAfter)
    assert(ProductQuantizer.adcTopKIndexed(probe, path, topK = 10)
      .as[(Long, Long)].collect().toSeq == before,
      "compaction must not change search results")
    // already compact: no-op, and the witness still admits appends
    assert(!ProductQuantizer.compactPqIndex(spark, path).compacted)
    // the maintenance hook blesses the compacted layout (zero Spark jobs)
    assert(ProductQuantizer.verifyPqIndex(path).codeRows > 0)
    ProductQuantizer.appendToPqIndex(
      e.withColumn("vec_id", col("vec_id") + 100000L), path)
  }

  test("compactIvfPqIndex: list-partition leaves compacted under the witness") {
    val e = tables.embeddings.select("vec_id", "embedding")
    val path = tmpDir("ivfpq-compact")
    ProductQuantizer.saveIvfPqIndex(e.filter(col("vec_id") % 10 >= 3),
      d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
      kPq = 4, pqIterations = 1, path = path)
    (0 to 2).foreach { n =>
      ProductQuantizer.appendToIvfPqIndex(e.filter(col("vec_id") % 10 === n), path)
    }
    val probe = e.filter(col("vec_id") === 1L)
    val before = ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 10,
      nProbe = 4).as[(Long, Long)].collect().toSeq
    val fBefore = parquetFiles(s"$path/codes")
    val stats = ProductQuantizer.compactIvfPqIndex(spark, path)
    assert(stats.exists(_.compacted))
    assert(parquetFiles(s"$path/codes") < fBefore)
    assert(ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 10,
      nProbe = 4).as[(Long, Long)].collect().toSeq == before)
    // per-list counts in the meta are untouched by layout maintenance
    ProductQuantizer.appendToIvfPqIndex(
      e.withColumn("vec_id", col("vec_id") + 100000L), path)
  }

  test("compactIndex (inverted): BM25 hash-identical pre/post, stats maintained") {
    val docs = tables.documents.select("doc_id", "text")
    val path = tmpDir("inv-compact")
    InvertedIndex.saveIndex(docs.filter(col("doc_id") % 4 === 0), path)
    (1 to 3).foreach { n =>
      InvertedIndex.appendToIndex(docs.filter(col("doc_id") % 4 === n), path)
    }
    val terms = Seq("the", "data")
    // searchIndexedBm25 carries no ORDER BY (scores are the contract,
    // presentation order is the caller's) — compare as sorted rows
    val before = InvertedIndex.searchIndexedBm25(spark, path, terms)
      .collect().map(_.toString).toSeq.sorted
    val stats = InvertedIndex.compactIndex(spark, path)
    assert(stats.exists(_.compacted))
    assert(InvertedIndex.searchIndexedBm25(spark, path, terms)
      .collect().map(_.toString).toSeq.sorted == before,
      "BM25 depends on maintained corpus stats — compaction must not disturb them")
    InvertedIndex.appendToIndex(
      docs.withColumn("doc_id", col("doc_id") + 1000000L), path)
  }

  test("compactSemanticIndex: incremental dedup identical pre/post") {
    val e = tables.embeddings.select("vec_id", "embedding")
    val path = tmpDir("sem-compact")
    Similarity.saveSemanticIndex(e.filter(col("vec_id") % 10 >= 3),
      d = 64, k = 2, iterations = 1, path = path)
    (0 to 1).foreach { n =>
      Similarity.appendToSemanticIndex(e.filter(col("vec_id") % 10 === n), path)
    }
    val batch = e.filter(col("vec_id") % 10 === 2)
    val before = Similarity.semanticDedupIncremental(batch, path, threshold = 0.9)
      .collect().map(_.toString).toSeq
    val stats = Similarity.compactSemanticIndex(spark, path)
    assert(stats.exists(_.compacted))
    assert(Similarity.semanticDedupIncremental(batch, path, threshold = 0.9)
      .collect().map(_.toString).toSeq == before)
    Similarity.appendToSemanticIndex(batch, path)
  }

  test("a stale index refuses compaction loudly (never rewritten into clean files)") {
    val e = tables.embeddings.select("vec_id", "embedding")
    val path = tmpDir("pq-compact-stale")
    ProductQuantizer.savePqIndex(e, d = 64, m = 4, k = 4, iterations = 1,
      path = path)
    // a crash-after-commit facsimile: a data file appears with no meta
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "codes", "zz-orphan.parquet"),
      Array[Byte](1, 2, 3))
    val err = intercept[IllegalArgumentException](
      ProductQuantizer.compactPqIndex(spark, path))
    assert(err.getMessage.contains("stale"), err.getMessage)
  }
}
