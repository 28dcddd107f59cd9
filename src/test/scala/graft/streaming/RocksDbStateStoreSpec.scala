package graft.streaming

import graft.SparkSpec

/** Bounded-streaming-state gate (VERDICT r12 #6): the st* replay
  * entries run on the default HDFS-backed IN-MEMORY state store — fine
  * at sf0.1, a memory cliff at 100 TB key cardinality, where the
  * provider to ship is RocksDB (state spills to local disk, bounded
  * heap). This spec proves the engine's stateful operators are
  * provider-agnostic: the st04 dedup replay must produce IDENTICAL
  * output under `RocksDBStateStoreProvider`, and the replay child
  * session must actually inherit the caller's provider choice
  * (`newSession()` does not propagate runtime conf — see
  * [[StreamReplay.replaySession]]).
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private val Provider = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("replaySession propagates the caller's state-store provider") {
    val prev = spark.conf.get(Provider)
    spark.conf.set(Provider, RocksDb)
    try assert(StreamReplay.replaySession(spark).conf.get(Provider) == RocksDb)
    finally spark.conf.set(Provider, prev)
    // and with the default restored, the child gets the default back
    assert(StreamReplay.replaySession(spark).conf.get(Provider) == prev)
  }

  test("st04 dedup replay output is identical under the RocksDB state store") {
    val events = tables.events
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val defaultRows = sortedRows(StreamReplay.dedupReplay(spark, events))
    assert(defaultRows.nonEmpty, "replay must admit keys")
    val prev = spark.conf.get(Provider)
    spark.conf.set(Provider, RocksDb)
    try {
      // A broken/unloadable provider fails the query outright, so this
      // passing is non-vacuous; equality pins the semantics.
      val rocksRows = sortedRows(StreamReplay.dedupReplay(spark, events))
      assert(rocksRows == defaultRows,
        s"RocksDB replay diverged: ${rocksRows.size} vs ${defaultRows.size} rows")
    } finally spark.conf.set(Provider, prev)
  }

  test("st09 LSH-candidate replay output is identical under the RocksDB state store") {
    // The candidate stream is the one st* operator whose state uses a
    // kryo-encoded Seq[Long] per band bucket — the opaque-binary state
    // shape most worth pinning across providers.
    val docs = tables.documents.select("doc_id", "text")
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val defaultRows = sortedRows(StreamReplay.lshCandidateReplay(spark, docs))
    assert(defaultRows.nonEmpty)
    val prev = spark.conf.get(Provider)
    spark.conf.set(Provider, RocksDb)
    try {
      val rocksRows = sortedRows(StreamReplay.lshCandidateReplay(spark, docs))
      assert(rocksRows == defaultRows,
        s"RocksDB LSH replay diverged: ${rocksRows.size} vs ${defaultRows.size} rows")
    } finally spark.conf.set(Provider, prev)
  }

  test("st02/st03 interval-join replays are identical under the RocksDB state store") {
    // The interval joins are the most state-heavy st* entries
    // (dual-watermark join state on BOTH streams), yet their state
    // lives in the stream-stream join codec path — distinct from the
    // flatMapGroupsWithState codecs the other gates pin (VERDICT r13
    // #7). Inner + leftOuter cover both eviction disciplines.
    val events = tables.events.select("user_id", "event_id", "ts").limit(400)
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    for (joinType <- Seq("inner", "leftOuter")) {
      val defaultRows = sortedRows(
        StreamReplay.intervalJoinReplay(spark, events, joinType = joinType))
      assert(defaultRows.nonEmpty, s"$joinType replay must produce rows")
      val prev = spark.conf.get(Provider)
      spark.conf.set(Provider, RocksDb)
      try {
        val rocksRows = sortedRows(
          StreamReplay.intervalJoinReplay(spark, events, joinType = joinType))
        assert(rocksRows == defaultRows,
          s"RocksDB $joinType interval-join replay diverged: " +
            s"${rocksRows.size} vs ${defaultRows.size} rows")
      } finally spark.conf.set(Provider, prev)
    }
  }

  test("st08 funnel replay output is identical under the RocksDB state store") {
    // The funnel carries the richest state shape of the st* family
    // (per-user times + candidate frontiers, a nested Seq[Seq[Long]]
    // encoder) — exactly the state most worth pinning across providers.
    val events = tables.events.select("user_id", "ts", "event_type", "event_id")
    val stages = Seq("view", "click", "purchase")
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val defaultRows = sortedRows(StreamReplay.funnelReplay(spark, events, stages))
    assert(defaultRows.nonEmpty)
    val prev = spark.conf.get(Provider)
    spark.conf.set(Provider, RocksDb)
    try {
      val rocksRows = sortedRows(StreamReplay.funnelReplay(spark, events, stages))
      assert(rocksRows == defaultRows,
        s"RocksDB funnel replay diverged: ${rocksRows.size} vs ${defaultRows.size} rows")
    } finally spark.conf.set(Provider, prev)
  }
}
