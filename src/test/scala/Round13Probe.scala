import graft.{GraftSession, SparkEntry}

/** Round-13 probe: adjudicate q02_predicates — the only entry above 2×
  * its baseline floor in BENCH_r12 (0.18 s recorded → 0.44 s, uniformly
  * elevated across all three passes rather than the usual
  * one-clean-pass contention signature; VERDICT r12 "Next round" #2).
  * Run with `Test/runMain Round13Probe`; results recorded in NOTES.md.
  *
  * Method: the bench harness's own measurement (noop sink, cache
  * cleared between passes), 6 passes of q02_predicates alone, with
  * q02_filter (a single-predicate scan over the same orders table) as
  * the control, plus the executed plan's PushedFilters line so a
  * pushdown regression (e.g. the NTZ loader cast blocking parquet
  * filters) is visible directly rather than inferred. dd08_components
  * gets the same 6-pass isolation treatment as the refresh evidence for
  * its stale BASELINE.md row (VERDICT #3: row recorded pre-checkpoint-
  * fix; isolated probes put shipped code at ~5-6 s).
  */
object Round13Probe {
  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label%-40s $s%8.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "graft-round13probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    def run(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }

    // Warm file-index/codegen paths like the bench harness does.
    run("q01_scan")

    // Pushdown audit first: both predicates must reach the parquet scan.
    val plan = SparkEntry.queries("q02_predicates")(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(l =>
      l.contains("PushedFilters") || l.contains("ReadSchema"))
      .foreach(l => println("PROBE plan: " + l.trim.take(200)))

    val q2p = (1 to 6).map(i => timed(s"q02_predicates pass $i")(run("q02_predicates")))
    val ctl = (1 to 3).map(i => timed(s"q02_filter     pass $i")(run("q02_filter")))
    println(f"PROBE q02_predicates floor ${q2p.min}%.2f median ${q2p.sorted.apply(q2p.size / 2)}%.2f")
    println(f"PROBE q02_filter     floor ${ctl.min}%.2f")

    val dd = (1 to 6).map(i => timed(s"dd08_components pass $i")(run("dd08_components")))
    println(f"PROBE dd08_components floor ${dd.min}%.2f median ${dd.sorted.apply(dd.size / 2)}%.2f")
    spark.stop()
  }
}
