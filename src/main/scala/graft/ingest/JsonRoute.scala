package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Declarative JSON decode path — the production alternative to a typed
  * [[Transformer]]: `from_json` keeps parse + projection inside
  * whole-stage codegen (no JVM object per record, no serialization
  * boundary), with unparseable payloads surfaced as an `error` column
  * for DLQ routing instead of exceptions.
  */
object JsonRoute {

  /** envelopes(payload, attributes) → columns of `schema` + `error`
    * (null for good rows). Select `error IS NULL` rows for the sink and
    * the rest for the DLQ.
    */
  def route(envs: DataFrame, schema: StructType): DataFrame = {
    // PERMISSIVE mode fills fields with null on malformed input; the
    // corrupt-record column is the reliable parse-error signal.
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    envs
      .withColumn("parsed", from_json(col("payload"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("error",
        when(col("parsed._corrupt_record").isNotNull,
          concat(lit("json parse error: "), substring(col("parsed._corrupt_record"), 1, 64))))
      .select(col("payload") +: col("error") +:
        schema.fieldNames.toSeq.map(f => col(s"parsed.$f")): _*)
  }
}
