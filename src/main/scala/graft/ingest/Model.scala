package graft.ingest

/** Raw input unit: schemaless payload + source metadata attributes.
  * Mirrors the reference envelope (/root/reference/source/source.go:15-18);
  * attributes carry message-id / sent-timestamp / receive-count style
  * metadata when the source provides them.
  */
case class Envelope(payload: String, attributes: Map[String, String])

/** 1→N record transform (/root/reference/transformer/transformer.go:15-17).
  * Returning an empty Seq means "deliberately dropped" — the message is
  * still acknowledged (drop semantics, ingestor.go:476-488). Throwing
  * routes the envelope to the dead-letter output instead of failing the
  * batch (failure routing, ingestor.go:468-474).
  */
trait Transformer[T] extends Serializable {
  def transform(e: Envelope): Seq[T]
}

/** Flush thresholds (/root/reference/batcher/batcher.go:15-40 analog).
  * In Structured Streaming these map to the trigger interval plus
  * per-trigger source rate limits — count/bytes are admission limits,
  * time is the trigger clock; `maxRecordsPerFile` covers output sizing.
  */
final case class BatchPolicy(
    flushIntervalMs: Long = 5 * 60 * 1000L,      // FlushInterval (5 min default)
    maxItemsPerTrigger: Option[Long] = None,     // MaxItems (off by default)
    maxBytesPerTrigger: Option[Long] = Some(5L * 1024 * 1024), // MaxEstimatedInputBytes (5 MiB)
    maxRecordsPerFile: Option[Long] = None)

/** Parquet compression codec surface, mirroring the reference's
  * case-insensitive parse with a hard error on unsupported codecs
  * (/root/reference/encoder/encoder_parquet.go:31-43).
  */
object ParquetCodec {
  val Supported: Set[String] = Set("none", "snappy", "gzip", "zstd")

  /** @return the Spark option value; throws IllegalArgumentException on
    *         unsupported codecs (config errors are fatal by design).
    */
  def parse(name: String): String = {
    val c = name.toLowerCase(java.util.Locale.ROOT)
    require(Supported.contains(c), s"unsupported parquet compression codec: $name")
    if (c == "none") "uncompressed" else c
  }
}
