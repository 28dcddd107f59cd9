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

  test("parquet schema evolution: added column merges, old rows null-fill, pruning survives") {
    // A long-lived ingest lake accumulates files written under different
    // schema versions; mergeSchema must present the union and the reader
    // must still prune columns/filters against the evolved table.
    import org.apache.spark.sql.functions._
    val dir = tmpDir("evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("v1"), col("v2"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30.0)), (4L, "d", Some(40.0))))
    // pruning/pushdown still reach the scan on the merged schema
    val plan = merged.filter(col("id") > 2).select("id", "v2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,2)"),
      s"filter must reach the scan as a pushed filter:\n${plan.take(500)}")
    assert(plan.contains("ReadSchema: struct<id:bigint,v2:double>"),
      "scan must read only the projected columns of the EVOLVED schema")
  }
}
