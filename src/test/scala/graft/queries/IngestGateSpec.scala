package graft.queries

import graft.SparkSpec

/** The ingestion gate's invariants at sf0.001, beyond what the DuckDB
  * hash oracle proves per round (IngestGate doc): failure routing
  * lands in the DLQ and never the sink, drops vanish, the 1→N flatMap
  * doubles exactly the 'F' orders, and the sink's directory layout is
  * genuinely hive `y=/m=/d=/h=`.
  */
class IngestGateSpec extends SparkSpec {

  private lazy val result = {
    val df = IngestGate.all.find(_.name == "ig01_ingest_roundtrip").get
      .run(spark, sfDir)
    df.cache()
    df.count()
    df
  }

  test("gate produces rows and excludes corrupt + dropped orders") {
    import org.apache.spark.sql.functions._
    assert(result.count() > 0)
    // corrupt (id % 1000 == 0) must be absent
    assert(result.filter(col("id") % 1000 === 0).count() == 0)
    // every surviving id is in the fed subset
    assert(result.filter(col("id") % 20 =!= 0).count() == 0)
  }

  test("1→N flatMap: each 'F' order appears exactly as order+filled pair") {
    import org.apache.spark.sql.functions._
    val perId = result.groupBy("id")
      .agg(count(lit(1)).as("n"), countDistinct("kind").as("kinds"))
    // ids appear once (kind=order) or twice (order+filled), never more
    assert(perId.filter(col("n") > 2).count() == 0)
    assert(perId.filter(col("n") === 2 && col("kinds") =!= 2).count() == 0)
  }

  test("corrupt payloads land in the DLQ with the error attached") {
    import org.apache.spark.sql.functions._
    val dlq = spark.read.parquet(s"${IngestGate.RoundtripRoot}/dlq")
    assert(dlq.count() > 0)
    assert(dlq.filter(col("error").isNull).count() == 0)
    assert(dlq.filter(col("payload").contains("CORRUPT")).count() == dlq.count())
  }

  test("sink layout is hive y=/m=/d=/h= and h matches id % 24") {
    import org.apache.spark.sql.functions._
    val leaf = new java.io.File(s"${IngestGate.RoundtripRoot}/sink")
      .listFiles().filter(_.isDirectory).head
    assert(leaf.getName.startsWith("y="))
    assert(result.filter(col("h") =!= col("id") % 24).count() == 0)
  }
}
