package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression suite for the THREE parquet shapes the driver's testdata
  * generator has shipped `events.ts` in across regenerations:
  *
  *   1. `ns_long`  — TIMESTAMP(NANOS); under the
  *      `spark.sql.legacy.parquet.nanosAsLong` flag (set by GraftSession)
  *      Spark surfaces it as LONG nanos. The fixture writes the
  *      equivalent int64 nano column directly — indistinguishable from
  *      the real thing at the loader, which only sees LongType.
  *   2. `us_ntz`   — timestamp[us], isAdjustedToUTC=false (pandas/pyarrow
  *      default). Spark 4 reads TIMESTAMP_NTZ. This shape broke
  *      q16_window_range/rj01_range_join in round 11 when the driver
  *      silently regenerated testdata.
  *   3. `us_utc`   — timestamp[us], UTC-adjusted. Spark reads TIMESTAMP.
  *
  * `Tables.events` must normalize all three to session-TZ TIMESTAMP with
  * identical values (session TZ is pinned UTC, making every conversion
  * lossless), and every event-time query entry must return identical
  * rows regardless of which shape is on disk. A fourth testdata
  * regeneration that ships a new shape should fail HERE, loudly, not in
  * the round's correctness gate.
  */
class TimestampShapeSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  /** Entries that consume `events.ts` through analysis-sensitive paths
    * (epoch functions, event-time windows, as-of/range joins). The
    * streaming replays (st01-st07) share `Tables.events` for their batch
    * halves, so the loader assertion covers them without paying for
    * seven MemoryStream replays per shape.
    */
  private val tsEntries = Seq(
    "q16_window_frame", "q16_window_lag", "q16_window_range",
    "q16_window_firstlast", "q28_window_tumbling", "q29_session_window",
    "aj01_asof_last_purchase", "rj01_range_join")

  private var fixtureRoot: Option[Path] = None

  private def deleteRecursively(root: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  override def afterAll(): Unit = {
    fixtureRoot.foreach(deleteRecursively)
    super.afterAll()
  }

  private lazy val shapeDirs: Map[String, String] = {
    import spark.implicits._
    val root = Files.createTempDirectory("ts_shapes")
    fixtureRoot = Some(root)
    // Canonical normalized events (whatever shape the live testdata is in).
    val canon = tables.events
    def writeShape(name: String)(reshape: DataFrame => DataFrame): (String, String) = {
      val dir = root.resolve(name)
      Files.createDirectories(dir)
      reshape(canon).write.parquet(dir.resolve("events.parquet").toString)
      // The other tables are shape-irrelevant; symlink them so each
      // fixture dir is a complete sf directory without copying bytes.
      val src = Paths.get(sfDir)
      val listing = Files.list(src)
      try listing.forEach { p: Path =>
        val f = p.getFileName.toString
        if (f != "events.parquet")
          Files.createSymbolicLink(dir.resolve(f), p.toAbsolutePath)
      } finally listing.close()
      name -> dir.toString
    }
    // us_utc: force the modern UTC-adjusted micros physical type (the
    // session default INT96 would also read back as TIMESTAMP, but the
    // point is to pin the shape the generator would emit).
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val utc = try writeShape("us_utc")(identity)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    Map(
      utc,
      writeShape("us_ntz")(df => df.withColumn("ts", col("ts").cast("timestamp_ntz"))),
      writeShape("ns_long")(df => df.withColumn("ts", unix_micros(col("ts")) * lit(1000L)))
    )
  }

  test("loader normalizes every shipped ts shape to identical TIMESTAMP values") {
    val canon = tables.events
      .select("event_id", "ts").orderBy("event_id").collect().toSeq
    for ((shape, dir) <- shapeDirs) {
      val ev = Tables(spark, dir).events
      assert(ev.schema("ts").dataType == TimestampType,
        s"shape $shape: ts surfaced as ${ev.schema("ts").dataType}, not TIMESTAMP")
      val got = ev.select("event_id", "ts").orderBy("event_id").collect().toSeq
      assert(got == canon, s"shape $shape: normalized ts values diverge from canonical")
    }
  }

  test("a fourth (unknown) ts shape fails loudly at the loader") {
    val root = Files.createTempDirectory("ts_shape_bad")
    try {
      tables.events.withColumn("ts", col("ts").cast("string"))
        .write.parquet(root.resolve("events.parquet").toString)
      val e = intercept[IllegalStateException](Tables(spark, root.toString).events)
      assert(e.getMessage.contains("unsupported type"))
    } finally deleteRecursively(root)
  }

  test("event-time entries return identical rows on every shipped ts shape") {
    val queries = SparkEntry.queries
    for (name <- tsEntries) {
      assert(queries.contains(name), s"entry $name missing from SparkEntry.queries")
      val perShape = shapeDirs.map { case (shape, dir) =>
        shape -> queries(name)(spark, dir).collect().toSeq
      }
      val (refShape, refRows) = perShape.head
      for ((shape, rows) <- perShape.tail) {
        assert(rows == refRows,
          s"$name: shape $shape (${rows.size} rows) != shape $refShape (${refRows.size} rows)")
      }
    }
  }
}
