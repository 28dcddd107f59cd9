import graft.GraftSession
import graft.operators.{InvertedIndex, TextAnalysis}

import org.apache.spark.sql.functions._

/** Round-15 indexed-retrieval probe: measures the locality claim
  * behind ir04 ("a query reads only its terms' bucket directories,
  * however large the corpus") at a corpus 20x the sf1 documents
  * table — 100k docs, built by suffix-tagged replication (distinct
  * doc_ids, realistic duplicated content).
  *
  * Three timings, 2 passes each (floors):
  *   - index build (the one-off corpus pass);
  *   - on-the-fly BM25 (ir01 path — tokenizes the whole corpus per
  *     query);
  *   - indexed BM25 (ir04 path — bucket-pruned posting reads +
  *     broadcast corpus stats).
  * Results → NOTES.md. `Test/runMain Round15IrProbe`.
  */
object Round15IrProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-ir-probe15")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val base = spark.read.parquet(s"${sys.props("user.dir")}/fixtures/sf1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = base.count()
    val corpus = base
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * n).as("doc_id"), col("text"))
      .persist()
    println(s"PROBE15 corpus docs = ${corpus.count()}")

    val idxDir = java.nio.file.Files.createTempDirectory("ir-probe15").toString
    def time[A](what: String)(f: => A): Double = {
      val floors = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val floor = floors.min
      println(f"PROBE15 $what%-28s $floor%8.2f s (floor of 2)")
      floor
    }

    time("index build (one-off)") {
      InvertedIndex.saveIndex(corpus, idxDir)
    }
    val terms = Seq("merge", "dup", "window")
    val fly = time("bm25 on-the-fly (ir01 path)") {
      TextAnalysis.bm25(corpus, terms).count()
    }
    val idx = time("bm25 indexed (ir04 path)") {
      InvertedIndex.searchIndexedBm25(spark, idxDir, terms).count()
    }
    println(f"PROBE15 speedup = ${fly / idx}%.1fx")
    new scala.reflect.io.Directory(new java.io.File(idxDir)).deleteRecursively()
    spark.stop()
  }
}
