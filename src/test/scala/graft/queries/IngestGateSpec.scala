package graft.queries

import graft.SparkSpec

/** The ingestion gate's invariants at sf0.001, beyond what the DuckDB
  * hash oracle proves per round (IngestGate doc): failure routing
  * lands in the DLQ and never the sink, drops vanish, the 1→N flatMap
  * doubles exactly the 'F' orders, and the sink's directory layout is
  * genuinely hive `y=/m=/d=/h=`.
  *
  * Runs against its OWN temp root, never [[IngestGate.RoundtripRoot]]:
  * the fixed roots belong to the sequential Verify→DuckDB pair, and an
  * `sbt test` racing a concurrent gate run there could interleave the
  * wipe with the other JVM's in-flight streaming writes.
  */
class IngestGateSpec extends SparkSpec {

  private lazy val root = tmpDir("igate-spec")

  // every=20: a dense feed (75 envelopes at sf0.001, 15 corrupt, all
  // three statuses well-represented) — the oracle entries' default 200
  // exists to bound BENCH cost at sf0.1, which this suite doesn't pay.
  private lazy val result = {
    val df = IngestGate.ingestAndReadBack(spark, sfDir, root, every = 20L)
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
    result // force the pipeline run
    assert(IngestGate.dlqCount(spark, root) > 0)
    val dlq = spark.read.parquet(s"$root/dlq")
    assert(dlq.filter(col("error").isNull).count() == 0)
    assert(dlq.filter(col("payload").contains("CORRUPT")).count() == dlq.count())
  }

  test("sink layout is hive y=/m=/d=/h= and h matches id % 24") {
    import org.apache.spark.sql.functions._
    result // force the pipeline run
    val leaf = new java.io.File(s"$root/sink")
      .listFiles().filter(_.isDirectory).head
    assert(leaf.getName.startsWith("y="))
    assert(result.filter(col("h") =!= col("id") % 24).count() == 0)
  }

  test("ig03: post-write crash replays the batch and the guard skips the rewrite") {
    import org.apache.spark.sql.functions._
    val onceRoot = tmpDir("igate-once-spec")
    val out = IngestGate.ingestWithCrashReplay(spark, sfDir, onceRoot, every = 20L)
    // the harness itself REQUIREs crash-surfaced + marker-durable +
    // replay-skipped; here assert the resulting ROWS equal the clean
    // run's — the crash/replay must be invisible in the data
    val clean = result.collect().toSeq
    assert(out.collect().toSeq == clean,
      "crash-replay run must produce exactly the clean run's rows (no loss, no duplicates)")
    // and the sink holds no duplicate (id, kind) pairs
    assert(out.groupBy("id", "kind").count().filter(col("count") > 1).count() == 0)
  }

  test("value regex survives negative-exponent doubles (review r9)") {
    val e = graft.ingest.Envelope(
      """{"id": 40, "name": "1-URGENT", "value": 5.0E-4, "date": "1996-01-02", "hh": 16, "status": "O"}""",
      Map.empty)
    val out = new GateTransformer().transform(e)
    assert(out.map(_.value) == Seq(5.0e-4))
  }
}
