package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkSpec {
  // One session for the whole forked test JVM.
  lazy val spark: SparkSession = GraftSession("local[4]", "graft-test")
}

/** Base suite: shared session + testdata paths. */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sfDir = "/root/testdata/sf0.001"
  def tables: Tables = Tables(spark, sfDir)
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
