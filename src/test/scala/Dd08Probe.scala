package graft
object Dd08Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "dd08probe")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    docs.count()
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DD08 $label%-24s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (i <- 1 to 3) {
      val pairs = t(s"[$i] pairs") { val p = operators.TextDedup.exactJaccardPairs(docs, threshold = 0.8); p.count(); p }
      val lr = t(s"[$i] cc") { val x = operators.TextDedup.connectedComponentsWithRounds(pairs); x._1.count(); x }
      t(s"[$i] consume") { lr._1.orderBy("doc_id").write.mode("overwrite").format("noop").save() }
      println(s"DD08 [$i] rounds=${lr._2}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
