package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._
  import Quality._

  private val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (2L, None, 500.0), // null name; price out of [0,100]; dup id
    (3L, Some("zz"), -1.0)) // value not accepted; price below range
    .toDF("id", "name", "price")

  test("row-level rules fuse into one aggregate and count violations correctly") {
    val got = expectations(df, Seq(
      NotNull("name_nn", "name"),
      InRange("price_rng", "price", 0, 100),
      AcceptedValues("name_ok", "name", Seq("a", "b")),
      Check("id_pos", col("id") > 0)))
      .orderBy("rule")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("id_pos", 0L, 4L, true),
      ("name_nn", 1L, 4L, false),
      ("name_ok", 2L, 4L, false), // null violates accepted-values too
      ("price_rng", 2L, 4L, false)))
  }

  test("row-level rules produce ONE scan of the input, not one per rule") {
    val report = expectations(tables.orders, Seq(
      NotNull("a", "o_custkey"),
      InRange("b", "o_totalprice", 0, 1e9),
      Check("c", col("o_orderkey") > 0)))
    val plan = report.queryExecution.executedPlan.toString
    val scans = plan.split("FileScan parquet").length - 1
    assert(scans == 1, s"expected 1 fused scan for 3 row rules, got $scans:\n$plan")
  }

  test("Unique counts rows beyond the first per duplicated key group") {
    val got = expectations(df, Seq(Unique("id_uniq", Seq("id"))))
      .as[(String, Long, Long, Boolean)].head()
    assert(got == (("id_uniq", 1L, 4L, false)))
    val clean = expectations(df, Seq(Unique("all_uniq", Seq("id", "price"))))
      .as[(String, Long, Long, Boolean)].head()
    assert(clean == (("all_uniq", 0L, 4L, true)))
  }

  test("ForeignKey counts non-null orphans only") {
    val parent = Seq(1L, 2L).toDF("pid")
    val child = Seq(Some(1L), Some(9L), None).toDF("cid")
    val got = expectations(child, Seq(ForeignKey("fk", "cid", parent, "pid")))
      .as[(String, Long, Long, Boolean)].head()
    // 9 is an orphan; NULL is exempt (standard FK semantics); total = 3 child rows
    assert(got == (("fk", 1L, 3L, false)))
  }

  test("ForeignKey works when child and parent key columns share a name") {
    // The common FK shape: both sides call the key `order_id`. The rule
    // must rename the parent side internally or the join condition is
    // ambiguous on both references.
    val parent = Seq(1L, 2L).toDF("order_id")
    val child = Seq(1L, 2L, 7L).toDF("order_id")
    val got = expectations(child, Seq(ForeignKey("fk", "order_id", parent, "order_id")))
      .as[(String, Long, Long, Boolean)].head()
    assert(got == (("fk", 1L, 3L, false)))
  }

  test("rule names must be unique") {
    val e = intercept[IllegalArgumentException] {
      expectations(df, Seq(NotNull("x", "name"), Check("x", col("id") > 0)))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("tagViolations flags exactly the rows any row rule rejects") {
    val tagged = tagViolations(df, Seq(
      NotNull("nn", "name"), InRange("rng", "price", 0, 100)))
      .select("id", "price", "__violated")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(tagged == Set(
      (1L, 10.0, false), (2L, 20.0, false), (2L, 500.0, true), (3L, -1.0, true)))
  }

  test("tagViolations rejects keyed rules") {
    val e = intercept[IllegalArgumentException] {
      tagViolations(df, Seq(Unique("u", Seq("id"))))
    }
    assert(e.getMessage.contains("row-level"))
  }
}
