import graft.GraftSession
import graft.operators.ProductQuantizer

import org.apache.spark.sql.functions._

/** Round-16 PQ footprint probe: the "query path never touches the raw
  * embedding column" claim (pq02) made concrete as bytes on disk at
  * the sf1 scale point — the persisted code table vs the raw embedding
  * column it replaces at search time. Parquet compression blurs the
  * logical 64x (m·log2(k) bits vs d float32s); the honest number is
  * the measured file-size ratio plus the logical one.
  * `Test/runMain Round16PqSizeProbe`.
  */
object Round16PqSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-pqsize-probe16")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val emb = spark.read
      .parquet(s"${sys.props("user.dir")}/fixtures/sf1/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()

    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    }

    val base = java.nio.file.Files.createTempDirectory("pqsize").toString
    emb.write.mode("overwrite").parquet(s"$base/raw")
    val (codes, _) = ProductQuantizer.fitCodes(emb, d = 64, m = 4, k = 4,
      iterations = 2)
    // production layout: one row per vector, codes as a compact array
    codes.groupBy("id").agg(array_sort(collect_list(struct(col("sub"),
        col("cluster")))).as("sc"))
      .select(col("id"), transform(col("sc"), x => x("cluster")).as("codes"))
      .write.mode("overwrite").parquet(s"$base/codes")
    val rawB = dirBytes(s"$base/raw")
    val codeB = dirBytes(s"$base/codes")
    println(f"PROBE16P $n%,d vectors: raw embeddings $rawB%,d B, PQ codes " +
      f"$codeB%,d B -> ${rawB.toDouble / codeB}%.1fx smaller on disk " +
      f"(logical: 64 float32 = 256 B vs m*log2(k) = 1 B -> 256x; " +
      "parquet framing + ids dominate the small code files)")
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    spark.stop()
  }
}
