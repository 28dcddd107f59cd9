package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * `run` builds the result with the DataFrame/Dataset API (Catalyst plans
  * it); `oracleSql` is the equivalent ANSI SQL the driver executes in
  * DuckDB over the same parquet tables. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  * Queries without a SQL-expressible oracle set `oracleSql = None` and get
  * a weaker rows-only check.
  */
final case class GraftQuery(
    name: String,
    oracleSql: Option[String],
    run: (SparkSession, String) => DataFrame)
