import graft.{GraftSession, Tables}
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Round-8 scale probe: measured evidence that the new surface holds
  * beyond oracle scale. Run with `Test/runMain Round8Probe`; results
  * recorded in NOTES.md.
  *
  *  - partsupp-family joins at 10x sf0.1 (6M lineitem rows, key-remapped
  *    so the derived partsupp genuinely grows to ~6M pairs): the Q9
  *    composite-key join + exact-cents aggregation.
  *  - capped Jaccard at 20x documents (100k docs, every shingle's doc
  *    frequency multiplied 20x): the cap's pair-join bound vs the
  *    uncapped join. At 0.1% the cap (100 docs) sits below the cloned
  *    boilerplate shingles' df — the stuck-reducer regime the cap
  *    exists for. (At dd09's gate setting of 1% nothing in THIS corpus
  *    exceeds the cap; the gate verifies arithmetic, the probe verifies
  *    the bound.)
  */
object Round8Probe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[32]", "graft-round8probe")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")

    // --- Q9 shape at 10x: remap keys per replica so partsupp grows too.
    val rep = spark.range(10).select(col("id").as("rep"))
    val li = t.lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .crossJoin(rep)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * 20000L)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * 1000L)
    println(s"PROBE lineitem 10x rows = ${li.count()}")

    // Derived partsupp over the scaled pair domain (same derivation
    // shape as Tables.derivePartsupp: distinct fact pairs + attributes).
    val ps = timed("derive partsupp from 6M fact rows (distinct pairs)") {
      val pairs = li.select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey")).distinct()
      val out = pairs.select(col("ps_partkey"), col("ps_suppkey"),
        (((col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 99900 + 100)
          .cast("bigint") / 1000.0).as("ps_supplycost"))
        .persist()
      println(s"PROBE partsupp pairs = ${out.count()}")
      out
    }
    timed("Q9-shape composite-key join + cents agg (6M x 6M-pair)") {
      val n = li
        .join(ps, li("l_partkey") === ps("ps_partkey") &&
          li("l_suppkey") === ps("ps_suppkey"))
        .select((col("rep") % 25).cast("int").as("nation"),
          floor((col("l_extendedprice") * (lit(1) - col("l_discount"))
            - col("ps_supplycost") * col("l_quantity")) * 100 + 0.5)
            .cast("bigint").as("amount_cents"))
        .groupBy("nation").agg(sum("amount_cents"))
        .count()
      assert(n == 10L, s"expected 10 nation groups, got $n")
    }
    ps.unpersist()

    // --- Capped Jaccard at 20x: every doc cloned 20x with fresh ids.
    val docs20 = t.documents.select("doc_id", "text")
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"), col("text"))
    println(s"PROBE documents 20x rows = ${docs20.count()}")
    val sh = TextDedup.shingleSet(docs20).persist()
    val rawPairJoin = timed("uncapped shared-shingle join row count (20x corpus)") {
      sh.select(col("doc_id").as("a"), col("s"))
        .join(sh.select(col("doc_id").as("b"), col("s")), Seq("s"))
        .filter(col("a") < col("b")).count()
    }
    val capped = TextDedup.dropStopShingles(sh, maxDocFraction = 0.001).persist()
    val cappedPairJoin = timed("capped (0.1% => df<=100) shared-shingle join row count") {
      capped.select(col("doc_id").as("a"), col("s"))
        .join(capped.select(col("doc_id").as("b"), col("s")), Seq("s"))
        .filter(col("a") < col("b")).count()
    }
    println(f"PROBE join-work reduction = ${rawPairJoin.toDouble / math.max(1, cappedPairJoin)}%.1fx " +
      s"($rawPairJoin -> $cappedPairJoin joined pairs)")
    sh.unpersist(); capped.unpersist()
    spark.stop()
  }
}
