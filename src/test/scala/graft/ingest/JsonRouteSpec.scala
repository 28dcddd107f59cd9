package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonRouteSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("value", DoubleType)))

  test("declarative route splits good rows from parse errors") {
    val envs = Seq(
      Envelope("""{"id": 1, "name": "a", "value": 2.5}""", Map.empty),
      Envelope("not json", Map.empty),
      Envelope("""{"id": 2, "name": "b", "value": 3.5}""", Map.empty))
      .toDF()
    val routed = JsonRoute.route(envs, schema)
    assert(routed.filter($"error".isNull).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val bad = routed.filter($"error".isNotNull)
    assert(bad.count() == 1)
    assert(bad.select("error").as[String].head().contains("not json"))
  }

  test("route stays inside codegen (no ScalaUDF / deserialization)") {
    val envs = Seq(Envelope("""{"id": 1, "name": "a", "value": 2.5}""", Map.empty)).toDF()
    val plan = JsonRoute.route(envs, schema).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("DeserializeToObject"))
  }
}
