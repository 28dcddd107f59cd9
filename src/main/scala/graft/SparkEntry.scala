package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every operator the engine exposes, as named verifiable queries. */
  def allQueries: Seq[GraftQuery] =
    RelationalQueries.all ++ PartsuppQueries.all ++ ExtensionQueries.all ++
      IngestGate.all ++ TokenQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.init(spark)
    allQueries.find(_.name == "q10_agg_hash").get.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> { (s: SparkSession, d: String) =>
      GraftSession.init(s)
      q.run(s, d)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracleSql.map(q.name -> _)).toMap
}
