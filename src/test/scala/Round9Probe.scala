import graft.{GraftSession, Tables}
import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** Round-9 scale probe: measured evidence for the round's new operator.
  * Run with `Test/runMain Round9Probe`; results recorded in NOTES.md.
  *
  * Claim under test (Bpe.train's scale note): the corpus pass — word
  * frequencies — is the only cost that grows with corpus size; every
  * merge round then iterates on the DISTINCT-WORD table, so training
  * cost at 20x the corpus should be the one heavier first pass plus
  * near-constant rounds. Measured by training the same 20-merge vocab
  * on sf0.1 documents (5k docs) and on a 20x replication (100k docs,
  * identical distinct-word set), asserting vocab equality and
  * comparing wall times.
  */
object Round9Probe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[32]", "graft-round9probe")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")

    val docs = t.documents.select("text")
    val docs20x = docs.crossJoin(spark.range(20).select(col("id").as("rep")))
      .select("text")

    println(s"PROBE corpus 1x docs=${docs.count()} 20x docs=${docs20x.count()}")
    val distinctWords = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).select("w").distinct().count()
    println(s"PROBE distinct words (both corpora): $distinctWords")

    val v1 = timed("bpe train 20 merges, 1x corpus") {
      Bpe.train(docs, "text", nMerges = 20)
    }
    val v20 = timed("bpe train 20 merges, 20x corpus") {
      Bpe.train(docs20x, "text", nMerges = 20)
    }
    assert(v1.merges == v20.merges,
      "replication must not change learned merges (frequencies scale uniformly)")
    println(s"PROBE vocab stable across 20x replication: ${v1.merges.take(5)}...")

    // The real corpus has only 31 distinct words, so the word table is
    // trivial; the synthetic arm gives the merge rounds a 50k-word
    // vocabulary (20 hex words per doc from a keyed md5) and scales ONLY
    // the corpus 20x — if rounds iterate on the distinct-word table as
    // claimed, the 20x time grows by roughly the one extra corpus-pass
    // cost, nowhere near 20x.
    def synth(nDocs: Long) = spark.range(nDocs).select(expr(
      """concat_ws(' ', transform(sequence(1, 20),
        |  j -> substring(md5(cast((id * 20 + j) % 50000 AS string)), 1, 8)))"""
        .stripMargin).as("text"))
    val s1 = timed("bpe train 10 merges, 50k-word vocab, 10k docs") {
      Bpe.train(synth(10000L), "text", nMerges = 10)
    }
    val s20 = timed("bpe train 10 merges, 50k-word vocab, 200k docs") {
      Bpe.train(synth(10000L).crossJoin(spark.range(20)).select("text"),
        "text", nMerges = 10)
    }
    assert(s1.merges == s20.merges,
      "synthetic replication must not change learned merges")
    println(s"PROBE 50k-vocab merges stable at 20x corpus: ${s1.merges.take(5)}...")

    zorderSkippingProbe(spark)

    spark.stop()
  }

  /** Claim under test (Layout.zorderRepartition's scale note): a
    * z-ordered file layout turns parquet row-group min/max stats into
    * skipped I/O for predicates on EITHER dimension, where a linear sort
    * only serves its leading column. Measured: 1M 2-D points written as
    * 32 files under each layout, then a 1/16-width band predicate on the
    * NON-leading dimension; the scan node's output rows after pushdown
    * approximate the rows actually read past row-group stats.
    */
  private def zorderSkippingProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Layout
    val n = 1024
    val pts = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).cast("long").as("y"),
      (col("id") * 2654435761L % 1000).as("payload"))
    val base = java.nio.file.Files.createTempDirectory("zorder-probe").toString
    try {
      timed("write 1M rows, 32 z-ordered files") {
        Layout.zorderRepartition(pts, "x", "y", nParts = 32, bits = 10)
          .write.mode("overwrite").parquet(s"$base/zorder")
      }
      timed("write 1M rows, 32 x-sorted files") {
        pts.repartitionByRange(32, col("x")).sortWithinPartitions("x")
          .write.mode("overwrite").parquet(s"$base/linear")
      }
      def scannedRows(dir: String): Long = {
        val df = spark.read.parquet(dir).filter(col("y") >= 512 && col("y") < 576)
        df.collect()
        val scan = df.queryExecution.executedPlan.collectLeaves().head
        scan.metrics("numOutputRows").value
      }
      val zRows = timed("y-band scan over z-ordered layout")(scannedRows(s"$base/zorder"))
      val linRows = timed("y-band scan over x-sorted layout")(scannedRows(s"$base/linear"))
      println(s"PROBE rows past row-group stats: zorder=$zRows linear=$linRows " +
        f"(${linRows.toDouble / zRows}%.1fx reduction)")
      assert(zRows < linRows,
        "z-order layout must let parquet stats skip row groups the linear layout reads")
    } finally {
      new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    }
  }
}
