import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.GraftSession
import graft.operators.TextDedup
import graft.Tables

/** Scratch stage-by-stage profile of the dd02/dd03 dedup pipeline. */
object ProfDedup {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession()
    val docs = Tables(spark, sfDir).documents

    t("docs.count")(docs.count())

    val sh = TextDedup.shingleSet(docs)
    t("shingleSet.count")(println("  shingles=" + sh.count()))

    val shP = TextDedup.shingleSet(docs).persist(StorageLevel.MEMORY_AND_DISK)
    t("shingleSet persist+count")(shP.count())

    val sig = TextDedup.minhashSignatures(shP)
    t("minhashSignatures")(sig.write.mode("overwrite").format("noop").save())

    val cand = TextDedup.lshCandidatePairs(sig)
    t("lshCandidatePairs")(println("  cand=" + cand.count()))

    val ver = TextDedup.jaccardVerify(cand, shP, 0.8).orderBy("doc_a", "doc_b")
    t("jaccardVerify")(ver.write.mode("overwrite").format("noop").save())

    t("jaccardVerify.localCkpt")(ver.localCheckpoint(true))
    shP.unpersist()
    spark.catalog.clearCache()

    t("dd02 full (as benched)")(
      TextDedup.minhashDedupPairs(docs, threshold = 0.8)
        .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()

    t("dd03 full (as benched)")(
      TextDedup.exactJaccardPairs(docs, threshold = 0.8)
        .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()

    // dd03 without the eager checkpoint, same cache discipline
    val sh2 = TextDedup.shingleSet(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh2.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh2.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh2.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val noCkpt = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), graft.functions.round4(col("jac")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
    t("dd03 no-ckpt")(noCkpt.write.mode("overwrite").format("noop").save())
    sh2.unpersist()

    spark.stop()
  }
}
