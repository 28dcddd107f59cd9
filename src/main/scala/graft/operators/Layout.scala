package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB stance: bucketing for
  * shuffle-free co-located joins, and salting for skewed keys.
  */
object Layout {

  /** Persist `df` as a managed table bucketed+sorted by `key`. Two
    * tables bucketed by the same key into the same bucket count join
    * with NO exchange on either side — the shuffle is paid once at
    * write time and amortized over every subsequent join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Salted equi-join for skewed keys: the big side gets a salt in
    * [0, salts); the small side is replicated once per salt value, so a
    * hot key's rows spread over `salts` reducers instead of one.
    * Result equals `big.join(small, key)` exactly. (AQE's skew-join
    * split handles moderate skew automatically; explicit salting is for
    * the pathological keys AQE can't split, e.g. a single giant group.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial counts per (key, salt), then
    * final per key — the map-side-combine pattern made explicit for
    * hot-key distributions where one reducer would otherwise own the
    * whole group.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("n"))
  }
}
