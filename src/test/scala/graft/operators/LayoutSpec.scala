package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on either side") {
    // a fresh in-memory metastore doesn't know about table dirs left by
    // a previous JVM — clear both name and location
    Seq("orders_b", "customer_b").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), tb)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Layout.writeBucketed(tables.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 8)
    Layout.writeBucketed(tables.customer.select("c_custkey", "c_name"),
      "customer_b", "c_custkey", 8)
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(800)}")
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // The third leg of the layout/skew toolkit: at scale, a selective
    // dim-side filter should cut the FACT side's shuffle before it
    // happens. Spark's InjectRuntimeFilter builds a bloom filter over
    // the filtered creation side and applies might_contain on the
    // application side below its shuffle. The production thresholds
    // (creation side < 10 MB, application scan > 10 GB) are exactly the
    // 100 TB shape and never fire at test scale, so the gate lowers the
    // application-side threshold and pins the injection — proving the
    // engine's sessions leave the optimization reachable (AQE on,
    // nothing disables the rule).
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val dim = tables.customer.filter($"c_acctbal" > 9000).select("c_custkey")
      val joined = tables.orders.join(dim, $"o_custkey" === $"c_custkey")
        .select("o_orderkey", "o_custkey")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter on the probe side:\n${optimized.take(1200)}")
      // pruning must be transparent: same rows as the unfiltered plan
      val expected = withSQLConf(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        tables.orders.join(dim, $"o_custkey" === $"c_custkey").count()
      }
      assert(joined.count() == expected)
    }
  }

  test("zValue is a bijection on the grid and fills exactly 2*bits bits") {
    val n = 256 // 8-bit coords -> 16-bit z
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).cast("long").as("y"))
    val z = grid.select(Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
    assert(z.distinct().count() == n.toLong * n, "interleave must not collide")
    val (mn, mx) = z.agg(min("z"), max("z")).as[(Long, Long)].head()
    assert(mn == 0L && mx == (1L << 16) - 1, s"z range [$mn, $mx] must fill 16 bits")
    // the whole expression must stay inside whole-stage codegen (no UDF)
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "zValue must compose codegen'd built-ins only")
  }

  test("z-order layout bounds BOTH dimensions per file; a linear sort bounds only its leading column") {
    // 256x256 uniform grid into 16 range-partitions ("files"). Linear
    // sort by x gives each file a sliver: x-width ~16 but the FULL
    // y-range (~255), so a predicate on y prunes nothing. The z-order
    // layout gives every file a bounded rectangle in BOTH dimensions —
    // this per-file min/max boundedness is exactly what parquet
    // row-group stats turn into skipped I/O at 100 TB.
    val n = 256
    val pts = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).cast("long").as("y"))
    def widths(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("xw"), (max("y") - min("y")).as("yw"))
        .select("xw", "yw").as[(Long, Long)].collect().toSeq
    val zWidths = widths(Layout.zorderRepartition(pts, "x", "y", nParts = 16, bits = 8))
    val linWidths = widths(pts.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    val zAvgY = zWidths.map(_._2).sum.toDouble / zWidths.size
    val linAvgY = linWidths.map(_._2).sum.toDouble / linWidths.size
    assert(linAvgY > 0.9 * (n - 1), s"linear layout should span y fully, got $linAvgY")
    assert(zAvgY < 0.6 * linAvgY,
      s"z-order files must bound y: avg y-width $zAvgY vs linear $linAvgY")
    // and x stays bounded too (the layout trades a little x-width for y)
    val zAvgX = zWidths.map(_._1).sum.toDouble / zWidths.size
    assert(zAvgX < 0.6 * (n - 1), s"z-order files must bound x too, got $zAvgX")
  }

  test("compactBucketedPath honors targetFileBytes: k files per bucket, all bucket-pure") {
    // ~big-index regime in miniature: the rewrite must NOT collapse to
    // one monolith per bucket when a bucket exceeds the target — it
    // writes k = ceil(bytes / (target * nBuckets)) files per bucket,
    // every file still single-bucket (repartition into a MULTIPLE of
    // nBuckets preserves pmod alignment), so bucketed joins stay
    // exchange-free through maintenance at any index size.
    val path = tmpDir("bucket-ktarget") + "/idx"
    val df = (0 until 20000).map(i => (i.toLong, s"k${i % 97}", "x" * 40))
      .toDF("id", "bucket", "pad")
    Layout.saveBucketedPath(df, path, "bucket", 2)
    Layout.appendBucketedPath(
      (20000 until 21000).map(i => (i.toLong, s"k${i % 97}", "x" * 40))
        .toDF("id", "bucket", "pad"), path)
    val (files0, bytes) = MetaIO.parquetLeafStats(path)
    val target = bytes / 7 // forces k = ceil(7 / 2) = 4 files per bucket
    val before = Layout.loadBucketedPath(spark, path)._1
      .select("id").as[Long].collect().sorted.toSeq
    val stats = Layout.compactBucketedPath(spark, path, target)
    assert(stats.compacted, s"expected a rewrite, got $stats (files0=$files0)")
    assert(stats.filesAfter > 2 && stats.filesAfter <= 8,
      s"expected multiple bucket-pure files per bucket (k*n in (2, 8]), got $stats")
    // every file carries exactly one bucket id suffix, k files each
    val suffixes = MetaIO.listDataFiles(path).map(_._1)
      .map(n => "_(\\d{5})".r.findFirstMatchIn(n).get.group(1))
    assert(suffixes.toSet.size == 2 &&
      suffixes.groupBy(identity).values.forall(_.size == stats.filesAfter / 2),
      s"files must spread evenly across buckets, got $suffixes")
    val after = Layout.loadBucketedPath(spark, path)._1
      .select("id").as[Long].collect().sorted.toSeq
    assert(after == before, "compaction must not change rows")

    // append refuses schema drift loudly: wrong column set AND a
    // same-name type drift (insertInto would cast it silently)
    val eCols = intercept[IllegalArgumentException](Layout.appendBucketedPath(
      Seq((1L, "k1")).toDF("id", "bucket"), path))
    assert(eCols.getMessage.contains("scramble columns"), eCols.getMessage)
    val eType = intercept[IllegalArgumentException](Layout.appendBucketedPath(
      Seq((1, "k1", "p")).toDF("id", "bucket", "pad"), path)) // id INT, index LONG
    assert(eType.getMessage.contains("silent positional cast"), eType.getMessage)
  }

  test("salted join equals the plain join") {
    val plain = tables.orders.join(tables.customer, $"o_custkey" === $"c_custkey")
      .groupBy("c_nationkey").count().orderBy("c_nationkey")
      .as[(Int, Long)].collect().toSeq
    val salted = Layout.saltedJoin(tables.orders, tables.customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 8)
      .groupBy("c_nationkey").count().orderBy("c_nationkey")
      .as[(Int, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("salted count equals plain count") {
    val plain = tables.orders.groupBy("o_custkey").count()
      .orderBy("o_custkey").as[(Long, Long)].collect().toSeq
    val salted = Layout.saltedCount(tables.orders, "o_custkey", 8)
      .select($"o_custkey", $"n".as("count")).orderBy("o_custkey")
      .as[(Long, Long)].collect().toSeq
    assert(salted == plain)
  }
}
