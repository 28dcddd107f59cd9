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

  test("suite compiles a multi-table spec into one fused report") {
    val parent = Seq((1L, "F"), (2L, "O"), (2L, "O")).toDF("pid", "status")
    val child = Seq((1L, 5.0), (1L, -2.0), (9L, 3.0)).toDF("pid", "v")
    val report = suite(
      Map("parent" -> parent, "child" -> child),
      Seq(
        TableRules("parent", Seq(
          AcceptedValues("status_ok", "status", Seq("F", "O")),
          Unique("pid_uniq", Seq("pid")))),
        TableRules("child", Seq(
          InRange("v_rng", "v", 0, 100),
          ForeignKeyRef("child_fk", "pid", "parent", "pid"),
          CountRatio("child_vol", "parent", minRatio = 2.0)))))
      .orderBy("table", "rule")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(report == Seq(
      // child: v=-2 out of range; pid=9 orphan; 3 rows < 2.0*3=6 → 3 short
      ("child", "child_fk", 1L, 3L, false),
      ("child", "child_vol", 3L, 3L, false),
      ("child", "v_rng", 1L, 3L, false),
      ("parent", "pid_uniq", 1L, 3L, false),
      ("parent", "status_ok", 0L, 3L, true)))
  }

  test("suite validates names and references loudly") {
    val d = Seq((1L, 1.0)).toDF("k", "v")
    val m = Map("t" -> d)
    intercept[IllegalArgumentException](suite(m, Seq.empty))
    intercept[IllegalArgumentException](suite(m,
      Seq(TableRules("nope", Seq(NotNull("a", "k"))))))
    // an empty rules list is a spec bug, not an empty.reduce crash
    val er = intercept[IllegalArgumentException](suite(m,
      Seq(TableRules("t", Seq.empty))))
    assert(er.getMessage.contains("has no rules"))
    intercept[IllegalArgumentException](suite(m, Seq(
      TableRules("t", Seq(NotNull("same", "k"), Check("same", col("k") > 0))))))
    intercept[IllegalArgumentException](suite(m, Seq(
      TableRules("t", Seq(ForeignKeyRef("fk", "k", "missing", "k"))))))
    intercept[IllegalArgumentException](suite(m, Seq(
      TableRules("t", Seq(CountRatio("cr", "missing", 1.0))))))
    // and expectations refuses suite-scoped rules instead of dropping them
    val e = intercept[IllegalArgumentException](
      expectations(d, Seq(ForeignKeyRef("fk", "k", "t", "k"))))
    assert(e.getMessage.contains("Quality.suite"))
  }

  test("suite row-level rules still cost ONE scan per table") {
    val report = suite(
      Map("orders" -> tables.orders, "lineitem" -> tables.lineitem),
      Seq(
        TableRules("orders", Seq(
          NotNull("a", "o_custkey"), InRange("b", "o_totalprice", 0, 1e9))),
        TableRules("lineitem", Seq(
          Check("c", col("l_quantity") >= 1), NotNull("d", "l_orderkey")))))
    val plan = report.queryExecution.executedPlan.toString
    val scans = plan.split("FileScan parquet").length - 1
    assert(scans == 2, s"expected 2 scans (one per table) for 4 row rules, got $scans:\n$plan")
  }

  test("tagViolations rejects keyed rules") {
    val e = intercept[IllegalArgumentException] {
      tagViolations(df, Seq(Unique("u", Seq("id"))))
    }
    assert(e.getMessage.contains("row-level"))
  }

  test("kAnonymityViolations: exactly the cells below k, counts intact") {
    import spark.implicits._
    // (x,1): 3 rows — safe at k=3; (x,2): 2 rows; (y,1): 1 row
    val rows = Seq(("x", 1), ("x", 1), ("x", 1), ("x", 2), ("x", 2), ("y", 1))
      .toDF("seg", "bin")
    val got = Quality.kAnonymityViolations(rows, Seq("seg", "bin"), k = 3)
      .orderBy("seg", "bin")
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(("x", 2, 2L), ("y", 1, 1L)))
    // k=2: only the singleton cell remains
    val strict = Quality.kAnonymityViolations(rows, Seq("seg", "bin"), k = 2)
      .as[(String, Int, Long)].collect().toSeq
    assert(strict == Seq(("y", 1, 1L)))
  }

  test("kAnonymityViolations guards: columns and k validated") {
    import spark.implicits._
    val df2 = Seq(("a", 1)).toDF("seg", "bin")
    intercept[IllegalArgumentException](
      Quality.kAnonymityViolations(df2, Seq.empty, 3))
    intercept[IllegalArgumentException](
      Quality.kAnonymityViolations(df2, Seq("seg"), 1))
  }
}
