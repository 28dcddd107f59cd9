package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two halves of the partsupp fixture contract together:
  * `Tables.partsupp` (the materialized parquet the Spark queries scan)
  * and `PartsuppQueries.psCte` (the derivation the DuckDB oracle
  * recomputes). If either side drifts, every q47-q52 oracle entry would
  * fail at the driver — this spec catches the drift at `sbt test` time.
  */
class PartsuppQueriesSpec extends SparkSpec {

  test("materialized partsupp equals the psCte derivation, row for row") {
    val tb = tables
    tb.registerViews()
    val derived = spark.sql(PartsuppQueries.psCte + " SELECT * FROM partsupp")
    val fixture = tb.partsupp
    assert(fixture.schema.map(f => (f.name, f.dataType)) ===
      derived.schema.map(f => (f.name, f.dataType)))
    assert(fixture.count() === derived.count())
    // Symmetric difference empty == identical row sets.
    assert(fixture.exceptAll(derived).isEmpty && derived.exceptAll(fixture).isEmpty)
  }

  test("Fixtures: version participates in the path and generation runs once per version") {
    import java.util.concurrent.atomic.AtomicInteger
    val calls = new AtomicInteger(0)
    val name = s"spec-scratch/${System.nanoTime()}"
    def gen(dir: java.io.File): Unit = { calls.incrementAndGet(); () }
    val d1 = graft.Fixtures.ensure(name, "v1")(gen)
    val d1again = graft.Fixtures.ensure(name, "v1")(gen)
    assert(d1 == d1again && calls.get() == 1, "same version must be served from disk")
    val d2 = graft.Fixtures.ensure(name, "v2")(gen)
    assert(d2 != d1 && calls.get() == 2, "a version bump must regenerate in a new dir")
  }

  test("Fixtures.pathTag distinguishes paths that sanitize identically") {
    assert(graft.Fixtures.pathTag("/a/b_1") != graft.Fixtures.pathTag("/a/b/1"))
    assert(graft.Fixtures.pathTag("/root/testdata/sf0.01") !=
      graft.Fixtures.pathTag("/root/testdata/sf0.1"))
  }

  test("referential integrity: every lineitem (partkey, suppkey) pair is in partsupp") {
    val tb = tables
    val missing = tb.lineitem
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .join(tb.partsupp.select("ps_partkey", "ps_suppkey"),
        Seq("ps_partkey", "ps_suppkey"), "left_anti")
    assert(missing.isEmpty, "lineitem pairs absent from partsupp")
  }

  test("every part has at least 4 distinct suppliers (formula floor)") {
    val tb = tables
    val under = tb.partsupp.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("n"))
      .filter(col("n") < 4)
    assert(under.isEmpty, "parts with fewer than the guaranteed 4 suppliers")
  }

  test("availqty and supplycost are the declared pure-integer functions of the keys") {
    val bad = tables.partsupp.filter(
      col("ps_availqty") =!= ((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 9999 + 1).cast("int") ||
      col("ps_supplycost") =!=
        ((col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 99900 + 100).cast("bigint") / 1000.0)
    assert(bad.isEmpty)
  }
}
