package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects cosine_similarity without registerAll") {
    // fresh session sharing the context but with its own extensions
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = spark.sql(
        "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .head().getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
    } finally () // shared context: do not stop
  }
}
