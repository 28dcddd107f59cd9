package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("readMerged unions evolving batch schemas; old rows get NULL for new columns") {
    val root = tmpDir("drift")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$root/batch0")
    Seq((3L, 30.0, "x"), (4L, 40.0, "y")).toDF("id", "v", "tag")
      .write.mode("overwrite").parquet(s"$root/batch1")
    val got = SchemaDrift.readMerged(spark, root)
      .select("id", "v", "tag").as[(Long, Double, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10.0, None), (2L, 20.0, None),
      (3L, 30.0, Some("x")), (4L, 40.0, Some("y"))))
  }

  test("conform fills missing nullable columns, up-casts, keeps target order") {
    val target = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("tag", StringType, nullable = true)))
    // batch with int id (up-castable) and no tag, columns out of order
    val batch = Seq((1.5, 7), (2.5, 8)).toDF("v", "id")
      .select(col("v"), col("id").cast("int").as("id"))
    val got = SchemaDrift.conform(batch, target)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(got.schema("id").dataType == LongType)
    assert(got.as[(Long, Double, Option[String])].collect().sortBy(_._1).toSeq ==
      Seq((7L, 1.5, None), (8L, 2.5, None)))
  }

  test("conform rejects lossy casts, extra columns, and missing required columns") {
    val target = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    // long -> int is narrowing: refuse
    val narrow = Seq((1L, 1.0)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException](SchemaDrift.conform(narrow, target))
    assert(e1.getMessage.contains("not a lossless up-cast"))
    // extra column: refuse unless dropExtra
    val extra = Seq((1, 1.0, "x")).toDF("id", "v", "junk")
    val e2 = intercept[IllegalArgumentException](SchemaDrift.conform(extra, target))
    assert(e2.getMessage.contains("junk"))
    assert(SchemaDrift.conform(extra, target, dropExtra = true)
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // missing non-nullable: refuse
    val missing = Seq(Tuple1(1.0)).toDF("v")
    val e3 = intercept[IllegalArgumentException](SchemaDrift.conform(missing, target))
    assert(e3.getMessage.contains("NON-nullable"))
  }
}
