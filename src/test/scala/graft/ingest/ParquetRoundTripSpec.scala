package graft.ingest

import graft.SparkSpec
import graft.ingest.examples.Item

/** Encoder round-trip parity suite (mirrors the reference's
  * encoder_parquet_test.go: encode → decode → exact row compare, all
  * four codecs, plus the PAR1 magic-bytes check).
  */
class ParquetRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val items = (1 to 1000).map(i => Item(i.toLong, s"name-$i", i * 1.5))

  for (codec <- Seq("none", "snappy", "gzip", "zstd")) {
    test(s"round-trip with codec=$codec preserves every row exactly") {
      val dir = tmpDir(s"rt-$codec")
      items.toDS().coalesce(1).write.mode("overwrite")
        .option("compression", ParquetCodec.parse(codec)).parquet(dir)
      val back = spark.read.parquet(dir).as[Item].collect().sortBy(_.id).toSeq
      assert(back == items)
      val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
      val suffix = Map("snappy" -> ".snappy.parquet", "gzip" -> ".gz.parquet", "zstd" -> ".zstd.parquet")
      suffix.get(codec).foreach(sfx => assert(f.getName.endsWith(sfx), s"unexpected file name ${f.getName}"))
      // PAR1 magic bytes at head and tail of the file
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val magic = "PAR1".getBytes("ASCII").toSeq
      assert(bytes.take(4).toSeq == magic && bytes.takeRight(4).toSeq == magic)
    }
  }

  test("sizes shrink under compression") {
    def sizeWith(codec: String): Long = {
      val dir = tmpDir(s"sz-$codec")
      // low-entropy payload so codecs have something to do
      (1 to 5000).map(i => Item(i.toLong, "x" * 50, 1.0)).toDS()
        .coalesce(1).write.mode("overwrite")
        .option("compression", ParquetCodec.parse(codec)).parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val none = sizeWith("none")
    assert(sizeWith("zstd") < none && sizeWith("gzip") < none && sizeWith("snappy") < none)
  }
}
