package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin engine facade: registers the dataset's tables as views, exposes
  * the SQL passthrough surface (with graft functions like
  * `cosine_similarity` registered), and typed access to the operator
  * modules via their objects.
  */
final class Graft private (val spark: SparkSession, val dir: String) {
  val tables: Tables = Tables(spark, dir)
  tables.registerViews()

  def sql(query: String): DataFrame = spark.sql(query)
  def table(name: String): DataFrame = spark.table(name)
}

object Graft {
  def apply(spark: SparkSession, dir: String): Graft = {
    GraftSession.init(spark)
    new Graft(spark, dir)
  }
}
