package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.tokens

/** Persisted inverted text index + conjunctive keyword search — the
  * exact-retrieval sibling of [[TextAnalysis.bm25]] (which scores on
  * the fly) and the text analog of the persisted [[IvfIndex]]: the
  * expensive corpus pass (tokenize + posting aggregation) happens ONCE
  * at build time; every query touches only the partitions holding its
  * terms.
  *
  * Postings are (term, doc_id, tf) rows written PARTITIONED BY a
  * crc32-derived `term_bucket` — the [[IvfIndex]] discipline: "a query
  * reads only its terms' buckets" is enforced by parquet DIRECTORY
  * partition pruning at the storage layer (`PartitionFilters` in the
  * plan), which no planner heuristic can disable (a bucketBy layout's
  * pruning is skipped whenever the planner disables bucketed scanning
  * for a query that doesn't join/agg on the bucket key — measured, and
  * exactly the shape of a search query). The query-side bucket ids are
  * computed driver-side with the same CRC so the filter is a literal
  * IN list; the doc-keyed intersection aggregate is the only shuffle,
  * sized by the matched postings, never the corpus.
  */
object InvertedIndex {

  // Underscore prefix: hidden from parquet directory listings.
  private val MetaFile = "_graft_inverted_index.properties"

  /** crc32(term) mod nBuckets — the Spark column form; MUST stay in
    * lockstep with [[termBucketLocal]] (spec-pinned equality). */
  private def termBucket(term: Column, nBuckets: Int): Column =
    pmod(crc32(term.cast("binary")), lit(nBuckets.toLong))

  /** The same bucket function evaluated driver-side for query terms. */
  private[operators] def termBucketLocal(term: String, nBuckets: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(term.getBytes("UTF-8"))
    c.getValue % nBuckets
  }

  /** (term, doc_id, tf) posting rows over the shared [[tokens]]
    * convention — one corpus scan + one (term, doc) aggregation. */
  def buildPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("int").as("tf"))

  /** Build + persist the index, partitioned by term bucket. */
  def saveIndex(docs: DataFrame, path: String, nBuckets: Int = 16): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    buildPostings(docs)
      .withColumn("term_bucket", termBucket(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("term_bucket").parquet(path)
    val p = new java.util.Properties()
    p.setProperty("nBuckets", nBuckets.toString)
    val f = java.nio.file.Paths.get(path, MetaFile)
    val out = java.nio.file.Files.newOutputStream(f)
    try p.store(out, "graft inverted index") finally out.close()
  }

  /** INCREMENTAL index maintenance — the [[TextDedup.saveBandIndex]] /
    * dd11 pattern for text retrieval: only the NEW batch is tokenized
    * and aggregated; its postings are APPENDED into the existing
    * term-bucket directories (parquet append writes new files, touches
    * nothing existing), so a nightly ingest costs the batch, never a
    * corpus re-index. Contract: batches carry doc_ids the index has
    * not seen (re-ingesting a doc would duplicate its (term, doc)
    * postings and over-count intersections — dedup upstream, exactly
    * as the ingest pipeline's effectively-once sink guarantees).
    */
  def appendToIndex(newDocs: DataFrame, path: String): Unit = {
    val nBuckets = {
      val f = java.nio.file.Paths.get(path, MetaFile)
      require(java.nio.file.Files.exists(f),
        s"$path has no $MetaFile — not a graft inverted index; build with saveIndex first")
      val p = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(f)
      try p.load(in) finally in.close()
      p.getProperty("nBuckets").toInt
    }
    buildPostings(newDocs)
      .withColumn("term_bucket", termBucket(col("term"), nBuckets))
      .write.mode("append").partitionBy("term_bucket").parquet(path)
  }

  /** Open a [[saveIndex]] directory: the partitioned posting table plus
    * its bucket count. Fails LOUDLY on a foreign directory. */
  def loadIndex(spark: SparkSession, path: String): (DataFrame, Int) = {
    val f = java.nio.file.Paths.get(path, MetaFile)
    require(java.nio.file.Files.exists(f),
      s"$path has no $MetaFile — not a graft inverted index; rebuild with saveIndex")
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(f)
    try p.load(in) finally in.close()
    (spark.read.parquet(path), p.getProperty("nBuckets").toInt)
  }

  /** Conjunctive (AND) search against a LOADED index: the bucket IN
    * list prunes partition directories before any row is read, then
    * [[searchAll]] intersects. */
  def searchIndexed(spark: SparkSession, path: String,
                    terms: Seq[String]): DataFrame = {
    val (postings, nBuckets) = loadIndex(spark, path)
    val buckets = terms.map(termBucketLocal(_, nBuckets)).distinct
    searchAll(postings.filter(col("term_bucket").isin(buckets: _*)), terms)
  }

  /** Conjunctive (AND) search: documents containing EVERY query term,
    * scored by total term frequency. Postings hold one row per
    * (term, doc), so `count == |terms|` is exact intersection. */
  def searchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    postings
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__nt"), sum("tf").cast("long").as("score"))
      .filter(col("__nt") === terms.length)
      .select(col("doc_id"), col("score"))
  }
}
