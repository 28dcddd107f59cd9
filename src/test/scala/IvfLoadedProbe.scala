import graft.{GraftSession, SparkEntry}

/** Round-13 companion probe for the new q26_similarity_ivf_loaded
  * entry (VERDICT r12 #4): measures the amortized search path at sf0.1
  * — first call pays the one-time KMeans build+save, subsequent calls
  * load the persisted index and search only the probed lists. Recorded
  * in NOTES.md next to the one-shot q26_similarity_ivf cost it
  * replaces on the production path. `Test/runMain IvfLoadedProbe`.
  */
object IvfLoadedProbe {
  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label%-44s $s%8.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "graft-ivfprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    def run(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }

    run("q01_scan") // warm
    // The persisted index survives across JVMs by design; delete this
    // dataset's index fixtures so the "cold" pass really measures the
    // build, not a warm load from a previous run (review r13).
    val tag = s"ivf-${graft.Fixtures.pathTag(sfDir)}"
    Option(new java.io.File(s"${sys.props("user.dir")}/fixtures").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(tag))
      .foreach(f => new scala.reflect.io.Directory(f).deleteRecursively())
    timed("q26_similarity_ivf_loaded (cold: build+save)")(run("q26_similarity_ivf_loaded"))
    val warm = (1 to 4).map(i =>
      timed(s"q26_similarity_ivf_loaded warm pass $i")(run("q26_similarity_ivf_loaded")))
    val oneShot = (1 to 3).map(i =>
      timed(s"q26_similarity_ivf (one-shot)   pass $i")(run("q26_similarity_ivf")))
    println(f"PROBE loaded warm floor ${warm.min}%.2f vs one-shot floor ${oneShot.min}%.2f")
    spark.stop()
  }
}
