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

    spark.stop()
  }
}
