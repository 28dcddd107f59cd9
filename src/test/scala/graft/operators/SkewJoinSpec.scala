package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = tables.events
  private lazy val customer = tables.customer.select("c_custkey", "c_mktsegment")

  test("salted join == plain join, row multiset for row multiset") {
    val salted = SkewJoin.saltedJoin(events, customer,
        bigKey = "user_id", smallKey = "c_custkey",
        discriminator = "event_id", factor = 8)
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().sorted.toSeq
    val plain = events.join(customer, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(salted.nonEmpty && salted == plain)
  }

  test("factor = 1 degenerates to the plain join") {
    val n1 = SkewJoin.saltedJoin(events, customer,
      "user_id", "c_custkey", "event_id", factor = 1).count()
    val n = events.join(customer, col("user_id") === col("c_custkey")).count()
    assert(n1 == n)
  }

  test("salt is deterministic: two runs select identical rows") {
    def run() = SkewJoin.saltedJoin(events, customer,
        "user_id", "c_custkey", "event_id", factor = 4)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(run() == run())
  }

  test("law: saltedJoin == plain join over random factors and skew profiles") {
    // ScalaCheck-generated skew profiles under a fixed seed (the
    // MinHashLawsSpec convention): per sample, a big side whose key
    // distribution ranges from uniform to one-hot-key pathological, a
    // small side with 0–2 rows per key (missing keys and small-side
    // duplicates both exercised), and a random salt factor. The law is
    // exact multiset equality with the unsalted join — salting must be
    // invisible in the result for EVERY profile, not just the oracle's.
    val params = Gen.Parameters.default
    val sampleGen = for {
      factor <- Gen.chooseNum(1, 16)
      nKeys <- Gen.chooseNum(1, 5)
      nBig <- Gen.chooseNum(20, 60)
      // hot-key weight 1..9 relative to 1 for the rest: skew dial
      hotW <- Gen.chooseNum(1, 9)
      bigKeys <- Gen.listOfN(nBig,
        Gen.frequency(hotW -> Gen.const(0L), 1 -> Gen.chooseNum(0L, nKeys - 1L)))
      smallCnt <- Gen.listOfN(nKeys, Gen.chooseNum(0, 2))
    } yield (factor, bigKeys, smallCnt)
    (0 until 12).foreach { i =>
      val (factor, bigKeys, smallCnt) =
        sampleGen.pureApply(params, Seed(77L + i))
      val big = bigKeys.zipWithIndex
        .map { case (k, row) => (row.toLong, k) }.toDF("row_id", "k")
      val small = smallCnt.zipWithIndex.flatMap { case (c, k) =>
        (0 until c).map(j => (k.toLong, s"v$k-$j"))
      }.toDF("sk", "payload")
      val salted = SkewJoin.saltedJoin(big, small, "k", "sk", "row_id", factor)
        .select(col("row_id"), col("payload"))
        .as[(Long, String)].collect().sorted.toSeq
      val plain = big.join(small, col("k") === col("sk"))
        .select(col("row_id"), col("payload"))
        .as[(Long, String)].collect().sorted.toSeq
      assert(salted == plain,
        s"sample $i (factor=$factor): salted ${salted.size} rows != plain ${plain.size}")
    }
  }

  test("reserved working names are rejected up front") {
    val big = Seq((1L, 2L)).toDF("k", "__salt")
    val small = Seq((2L, "x")).toDF("sk", "payload")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", "sk", "k", 4)
    }
  }

  test("skewed fixture: salting bounds the join exchange's hottest partition (VERDICT r7 #7)") {
    // 90%-hot-key fixture. The plain equi-join shuffles the big side by
    // hash(k): every hot row lands in ONE of the 32 partitions, so the
    // hottest task reads ~90% of the table — the stuck-reducer shape.
    // The salted join shuffles by hash(k, salt): the hot key spreads
    // over `factor` partitions. Measured on the row histogram of the
    // exact hash-partitioning the SortMergeJoin exchange performs
    // (spark_partition_id after repartition on the join keys) —
    // deterministic, no task-metric sampling.
    val n = 80000L
    val factor = 16
    val parts = 32
    val big = spark.range(n).select(
      when(col("id") < n * 9 / 10, 0L)
        .otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("rid"))
    val small = spark.range(1000).select(col("id").as("k2"),
      (col("id") * 2).as("payload"))

    def hottest(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id().as("p")).count()
        .agg(max("count")).as[Long].head()

    val hotRows = n * 9 / 10
    val plainMax = hottest(big.repartition(parts, col("k")))
    val saltedMax = hottest(big
      .withColumn("__s", pmod(xxhash64(col("rid")), lit(factor.toLong)))
      .repartition(parts, col("k"), col("__s")))
    assert(plainMax >= hotRows,
      s"plain exchange must funnel the hot key into one partition ($plainMax)")
    // Bound: (k, salt) groups land by hash, so a partition can collect a
    // few of the 16 hot-salt groups (birthday collisions) — the exact
    // per-partition count is hash-determined, not hotRows/factor. The
    // operator's guarantee is the RATIO: the hottest partition shrinks
    // by a multiple, and the hot key genuinely occupies many partitions.
    assert(saltedMax * 3 <= plainMax,
      s"salted hottest partition $saltedMax not well below plain $plainMax")
    val hotSpread = big
      .withColumn("__s", pmod(xxhash64(col("rid")), lit(factor.toLong)))
      .repartition(parts, col("k"), col("__s"))
      .filter(col("k") === 0L)
      .select(spark_partition_id()).distinct().count()
    assert(hotSpread >= factor / 2,
      s"hot key occupies only $hotSpread partitions (factor $factor)")

    // And the salted join's RESULT is the plain join's, on this fixture.
    val plain = big.join(small, col("k") === col("k2")).drop("k2")
      .orderBy("rid", "k").collect().toSeq
    val salted = SkewJoin.saltedJoin(big, small, "k", "k2", "rid", factor)
      .orderBy("rid", "k").collect().toSeq
    assert(salted == plain)
  }

  test("big side spreads each hot key over the salt space") {
    // All rows of the hottest key must NOT land on a single salt value —
    // that spread is the entire point of the operator.
    val salts = events.withColumn("__salt",
        pmod(xxhash64(col("event_id")), lit(8L)))
      .filter(col("user_id") === 0L)
      .select(countDistinct("__salt")).as[Long].head()
    assert(salts > 4, s"hot key rows spread over $salts of 8 salts")
  }

  test("AQE alone splits the 90%-hot join partition, no salting (VERDICT r8 #3)") {
    // The same 90%-hot fixture joined PLAIN under AQE: Spark's
    // OptimizeSkewedJoin must mark the sort-merge join skew-handled and
    // split the hot partition into several reads. Thresholds are scaled
    // to the fixture (defaults target 256 MiB partitions); a child
    // session isolates them. This is the operator-selection gate the
    // class doc promises: AQE first, saltedJoin for the shapes AQE
    // can't touch.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "3")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    s2.conf.set("spark.sql.shuffle.partitions", "32")

    val n = 200000L
    val big = s2.range(n).select(
      when(col("id") < n * 9 / 10, 0L)
        .otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("rid"))
    val small = s2.range(1000).select(col("id").as("k2"),
      (col("id") * 2).as("payload"))

    val joined = big.join(small, col("k") === col("k2"))
    // Execute THIS Dataset's own QueryExecution (count() would build a
    // different one and leave joined's adaptive plan unexecuted).
    assert(joined.collect().length == n) // every key 0..999 matches exactly once

    // Inspect the FINAL adaptive plan: the join node must be flagged
    // skew-handled (isSkewJoin) — i.e. OptimizeSkewedJoin split the hot
    // partition rather than leaving one stuck reducer.
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a
    }.getOrElse(fail("plan is not adaptive"))
    // String-level check: the final plan nests under QueryStageExec
    // LEAVES (collect() cannot traverse into them), and the formatter
    // prints `(skew=true)` exactly from the join's isSkewJoin flag and
    // `skewed` from the AQEShuffleRead's split specs.
    val finalPlan = adaptive.executedPlan.toString
    assert(finalPlan.contains("(skew=true)"),
      s"OptimizeSkewedJoin did not mark the join skew-handled:\n$finalPlan")
    assert(finalPlan.contains("AQEShuffleRead coalesced and skewed")
        || finalPlan.contains("AQEShuffleRead skewed"),
      s"hot partition was not split into skewed reads:\n$finalPlan")
  }
}
