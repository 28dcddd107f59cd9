package graft

/** Source/sink format coverage beyond parquet: CSV and JSON lines
  * round-trip with explicit schemas (schema-on-read, no inference
  * surprises), ORC as the columnar alternative.
  */
class IOFormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val region = tables.region.orderBy("r_regionkey")

  private def roundTrip(fmt: String): Unit = {
    val dir = tmpDir(s"fmt-$fmt")
    region.write.mode("overwrite").format(fmt).save(dir)
    val back = spark.read.format(fmt).schema(region.schema).load(dir)
      .orderBy("r_regionkey")
    assert(back.as[(Int, String)].collect().toSeq == region.as[(Int, String)].collect().toSeq)
  }

  test("csv round-trip with explicit schema")(roundTrip("csv"))
  test("json-lines round-trip with explicit schema")(roundTrip("json"))
  test("orc round-trip with explicit schema")(roundTrip("orc"))
}
