package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{round2, round4}

/** The relational operator surface (SURVEY.md §2-B Q1–Q25, Q28).
  *
  * Design rules, applied throughout:
  *   - declarative DataFrame API only — predicate pushdown, column pruning
  *     and join selection are Catalyst's job;
  *   - dimension tables (`region`, `nation`) get explicit `broadcast()`
  *     hints — at 100 TB the fact tables shuffle, the dims never should;
  *   - aggregations are pushed below joins where algebraically safe
  *     (pre-aggregate the fact table on the join key before joining a
  *     dimension), shrinking shuffle input;
  *   - every query ends in a total ORDER BY so the cross-engine hash is
  *     stable (part of the declared result contract).
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q01_scan",
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"),
      (s, d) => t(s, d).region
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")),

    GraftQuery(
      "q02_filter",
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > 150000 AND o_orderstatus = 'O' ORDER BY o_orderkey"),
      (s, d) => t(s, d).orders
        .filter(col("o_totalprice") > 150000 && col("o_orderstatus") === "O")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    GraftQuery(
      "q03_join_inner",
      Some("SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_name"),
      (s, d) => {
        val tb = t(s, d)
        tb.nation
          .join(broadcast(tb.region), col("n_regionkey") === col("r_regionkey"))
          .select("n_name", "r_name")
          .orderBy("n_name")
      }),

    GraftQuery(
      "q04_join_multi_agg",
      Some("SELECT r_name, ROUND(SUM(o_totalprice), 2) AS rev " +
        "FROM region JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "GROUP BY r_name ORDER BY r_name"),
      (s, d) => {
        val tb = t(s, d)
        // Pre-aggregate the fact table per customer before touching the
        // dimensions: shuffles SUMs per custkey instead of raw order rows.
        val perCust = tb.orders.groupBy("o_custkey")
          .agg(sum("o_totalprice").as("cust_rev"))
        perCust
          .join(tb.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(tb.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(tb.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(round2(sum("cust_rev")).as("rev"))
          .orderBy("r_name")
      }),

    GraftQuery(
      "q05_join_left",
      Some("SELECT c_custkey, COUNT(o_orderkey) AS n FROM customer " +
        "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey"),
      (s, d) => {
        val tb = t(s, d)
        // Aggregate-below-join: count per custkey first, then one
        // customer-sized left join instead of a customer×orders join.
        val perCust = tb.orders.groupBy("o_custkey")
          .agg(count("o_orderkey").as("n0"))
        tb.customer
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), coalesce(col("n0"), lit(0L)).as("n"))
          .orderBy("c_custkey")
      }),

    GraftQuery(
      "q06_join_semi",
      Some("SELECT c_custkey FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 200000) ORDER BY c_custkey"),
      (s, d) => {
        val tb = t(s, d)
        tb.customer
          .join(tb.orders.filter(col("o_totalprice") > 200000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey")
          .orderBy("c_custkey")
      }),

    GraftQuery(
      "q07_join_anti",
      Some("SELECT c_custkey FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
      (s, d) => {
        val tb = t(s, d)
        tb.customer
          .join(tb.orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey")
          .orderBy("c_custkey")
      }),

    GraftQuery(
      "q08_join_cross",
      Some("SELECT r_name, s_name FROM region CROSS JOIN supplier ORDER BY r_name, s_name"),
      (s, d) => {
        val tb = t(s, d)
        broadcast(tb.region).crossJoin(tb.supplier)
          .select("r_name", "s_name")
          .orderBy("r_name", "s_name")
      }),

    GraftQuery(
      "q09_join_theta",
      Some("SELECT s_suppkey, c_custkey FROM supplier JOIN customer " +
        "ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal ORDER BY s_suppkey, c_custkey"),
      (s, d) => {
        val tb = t(s, d)
        // Equi-part (s_nationkey = c_nationkey) drives the join strategy;
        // the range predicate is evaluated as a post-join condition.
        tb.supplier
          .join(tb.customer,
            col("s_nationkey") === col("c_nationkey") && col("s_acctbal") < col("c_acctbal"))
          .select("s_suppkey", "c_custkey")
          .orderBy("s_suppkey", "c_custkey")
      }),

    GraftQuery(
      "q10_agg_hash",
      Some("SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, " +
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, ROUND(AVG(l_discount), 2) AS avg_disc, " +
        "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
      (s, d) => t(s, d).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round2(sum("l_quantity")).as("sum_qty"),
          round2(sum("l_extendedprice")).as("sum_price"),
          round2(avg("l_discount")).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    GraftQuery(
      "q11_agg_distinct",
      Some("SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders"),
      (s, d) => t(s, d).orders.agg(countDistinct("o_custkey").as("n_cust"))),

    GraftQuery(
      "q02_predicates",
      Some("SELECT o_orderkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') " +
        "AND o_totalprice BETWEEN 50000 AND 100000 ORDER BY o_orderkey"),
      (s, d) => t(s, d).orders
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(50000, 100000))
        .select("o_orderkey")
        .orderBy("o_orderkey")),

    GraftQuery(
      "q10_having",
      Some("SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey " +
        "HAVING COUNT(*) >= 3 ORDER BY o_custkey"),
      (s, d) => t(s, d).orders
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy("o_custkey")),

    GraftQuery(
      // two distinct aggregates in one pass exercises the Expand plan
      "q11_multi_distinct",
      Some("SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(DISTINCT o_orderpriority) AS n_prio, " +
        "COUNT(*) AS n FROM orders"),
      (s, d) => t(s, d).orders.agg(
        countDistinct("o_custkey").as("n_cust"),
        countDistinct("o_orderpriority").as("n_prio"),
        count(lit(1)).as("n"))),

    GraftQuery(
      // group-concat family: deterministic via sorted collect + join
      "q10_string_agg",
      Some("SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS members " +
        "FROM region JOIN nation ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name"),
      (s, d) => {
        val tb = t(s, d)
        tb.region.join(tb.nation, col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("members"))
          .orderBy("r_name")
      }),

    GraftQuery(
      "q10_conditional_agg",
      // CAST: DuckDB COUNT_IF returns HUGEINT; Spark count_if returns BIGINT
      Some("SELECT l_returnflag, CAST(COUNT_IF(l_quantity > 25) AS BIGINT) AS big_n, " +
        "BOOL_OR(l_discount > 0.08) AS has_deep_disc, " +
        "BOOL_AND(l_quantity >= 1) AS all_positive " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => t(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_quantity") > 25).as("big_n"),
          bool_or(col("l_discount") > 0.08).as("has_deep_disc"),
          bool_and(col("l_quantity") >= 1).as("all_positive"))
        .orderBy("l_returnflag")),

    GraftQuery(
      // HLL++ sketch vs exact: the oracle checks the exact count; the
      // approximate side is self-checked within the declared 5 % band.
      "q12_approx_distinct",
      Some("SELECT COUNT(DISTINCT user_id) AS n_exact, CAST(1 AS BOOLEAN) AS within_5pct FROM events"),
      (s, d) => t(s, d).events
        // Dedup FIRST, then count + sketch the distinct set: a
        // countDistinct mixed with a non-distinct agg plans as
        // Expand x2 over every event row; the pre-distinct form is two
        // plain aggregates over the (much smaller) distinct set, with
        // map-side partial dedup before the exchange (guide §2.3).
        // The HLL sketch is duplicate-insensitive, so approx over the
        // distinct set is the IDENTICAL estimator.
        .select("user_id").distinct()
        .agg(
          // count(col), not count(*): countDistinct ignored NULLs, and
          // distinct() would keep a NULL row if one ever appeared.
          count(col("user_id")).as("n_exact"),
          // rsd 1% — the default 5% rsd means ~1-sigma error AT the 5%
          // acceptance band; 1% keeps the sketch well inside it
          approx_count_distinct(col("user_id"), 0.01).as("approx"))
        .select(col("n_exact"),
          (abs(col("approx") - col("n_exact")) / col("n_exact") <= 0.05).as("within_5pct"))),

    GraftQuery(
      // Mergeable-sketch pre-aggregation: per-group Apache DataSketches
      // HLL sketches unioned into a corpus-wide distinct estimate — the
      // 100 TB pattern where per-day/per-partition sketches are stored
      // compact and merged at query time instead of re-scanning raw
      // data. Like q12, the oracle checks the estimate against the
      // exact count inside a 5% band (default lgConfigK=12 ≈ 1.6% rse).
      "hl01_sketch_union",
      Some("SELECT COUNT(DISTINCT user_id) AS n_exact, " +
        "CAST(1 AS BOOLEAN) AS within_5pct FROM events"),
      (s, d) => {
        val ev = t(s, d).events
        ev.groupBy("event_type").agg(hll_sketch_agg(col("user_id")).as("sk"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
          .crossJoin(ev.agg(countDistinct("user_id").as("n_exact")))
          .select(col("n_exact"),
            (abs(col("approx") - col("n_exact")) / col("n_exact") <= 0.05)
              .as("within_5pct"))
      }),

    GraftQuery(
      // Sketch ALGEBRA (hl02): intersection estimate by
      // inclusion-exclusion over mergeable HLL sketches —
      // |A∩B| ≈ est(A) + est(B) − est(A∪B) — the query pattern that
      // lets 100 TB deployments answer arbitrary audience-overlap
      // questions from stored per-segment sketches without touching
      // raw data. Errors compound across three estimates, so the
      // acceptance band is 10% (vs hl01's 5% single-estimate band);
      // the oracle carries the exact intersection and the band verdict
      // rides the Spark side, the q12/hl01 discipline.
      "hl02_sketch_intersect",
      Some("SELECT COUNT(DISTINCT v.user_id) AS n_exact, " +
        "CAST(1 AS BOOLEAN) AS within_10pct " +
        "FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view') v " +
        "JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') p " +
        "ON v.user_id = p.user_id"),
      (s, d) => {
        val ev = t(s, d).events
        val skA = ev.filter(col("event_type") === "view")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val skB = ev.filter(col("event_type") === "purchase")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val est = skA.unionAll(skB)
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"))
          .crossJoin(skA.select(hll_sketch_estimate(col("sk")).as("est_a")))
          .crossJoin(skB.select(hll_sketch_estimate(col("sk")).as("est_b")))
          .select((col("est_a") + col("est_b") - col("est_union")).as("approx"))
        val exact = ev.filter(col("event_type") === "view")
          .select("user_id").distinct()
          .join(ev.filter(col("event_type") === "purchase")
            .select("user_id").distinct(), "user_id")
          .agg(count(lit(1)).as("n_exact"))
        exact.crossJoin(est)
          .select(col("n_exact"),
            (abs(col("approx") - col("n_exact")) / col("n_exact") <= 0.10)
              .as("within_10pct"))
      }),

    GraftQuery(
      "q13_rollup",
      Some("SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n"),
      (s, d) => t(s, d).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first, col("n"))),

    GraftQuery(
      // grouping() marker distinguishes subtotal rows from data rows
      "q13_rollup_grouping",
      Some("SELECT l_returnflag, CAST(GROUPING(l_returnflag) AS INTEGER) AS g, COUNT(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag) " +
        "ORDER BY l_returnflag NULLS FIRST, g, n"),
      (s, d) => t(s, d).lineitem
        .rollup(col("l_returnflag"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("g"), col("n"))),

    GraftQuery(
      // Full CUBE: all 2^k grouping-set combinations in one pass
      // (Spark expands to a single Expand + hash aggregate — no
      // per-combination rescans).
      "q13_cube",
      Some("SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
        "ROUND(SUM(l_quantity), 2) AS sq FROM lineitem " +
        "GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n"),
      (s, d) => t(s, d).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round2(sum("l_quantity")).as("sq"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first, col("n"))),

    GraftQuery(
      "q14_grouping_sets",
      Some("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n"),
      (s, d) => t(s, d).orders
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first, col("n"))),

    GraftQuery(
      "q15_window_rank",
      Some("SELECT c_custkey, o_orderkey, rn FROM (SELECT c_custkey, o_orderkey, " +
        "ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM customer JOIN orders ON o_custkey = c_custkey) t WHERE rn <= 3 ORDER BY c_custkey, rn"),
      (s, d) => {
        val tb = t(s, d)
        val w = Window.partitionBy("c_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        tb.customer
          .join(tb.orders, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("c_custkey", "rn")
      }),

    GraftQuery(
      // rank/dense_rank with ties: the window orders by price only, so
      // equal prices share a rank — deterministic without a tiebreaker.
      "q15_window_ranks",
      Some("SELECT c_custkey, o_orderkey, rnk, drnk FROM (SELECT c_custkey, o_orderkey, " +
        "RANK() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC) AS rnk, " +
        "DENSE_RANK() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC) AS drnk " +
        "FROM customer JOIN orders ON o_custkey = c_custkey) t WHERE rnk <= 3 " +
        "ORDER BY c_custkey, rnk, o_orderkey"),
      (s, d) => {
        val tb = t(s, d)
        val w = Window.partitionBy("c_custkey").orderBy(col("o_totalprice").desc)
        tb.customer
          .join(tb.orders, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("o_orderkey"),
            rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
          .filter(col("rnk") <= 3)
          .orderBy("c_custkey", "rnk", "o_orderkey")
      }),

    GraftQuery(
      "q16_window_frame",
      Some("SELECT user_id, event_id, ROUND(SUM(value) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rsum " +
        "FROM events ORDER BY user_id, event_id"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d).events
          .select(col("user_id"), col("event_id"), round2(sum("value").over(w)).as("rsum"))
          .orderBy("user_id", "event_id")
      }),

    GraftQuery(
      "q16_window_lag",
      Some("SELECT user_id, event_id, " +
        "ROUND((value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 100) / 100 + 0 AS dv, " +
        "ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) * 100) / 100 + 0 AS nv " +
        "FROM events ORDER BY user_id, event_id"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, d).events
          .select(col("user_id"), col("event_id"),
            round2(col("value") - lag("value", 1).over(w)).as("dv"),
            round2(lead("value", 1).over(w)).as("nv"))
          .orderBy("user_id", "event_id")
      }),

    GraftQuery(
      // trailing-window RANGE frame over event-time (ms since epoch so
      // both engines use identical integer range arithmetic)
      "q16_window_range",
      Some("SELECT user_id, event_id, ROUND(SUM(value) OVER (PARTITION BY user_id " +
        "ORDER BY epoch_ms(ts) RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) * 100) / 100 + 0 AS trailing_1h " +
        "FROM events ORDER BY user_id, event_id"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(unix_millis(col("ts")))
          .rangeBetween(-3600000L, Window.currentRow)
        t(s, d).events
          .select(col("user_id"), col("event_id"), round2(sum("value").over(w)).as("trailing_1h"))
          .orderBy("user_id", "event_id")
      }),

    GraftQuery(
      "q16_window_firstlast",
      Some("SELECT user_id, event_id, " +
        "ROUND(FIRST_VALUE(value) OVER w, 2) AS fv, " +
        "ROUND(LAST_VALUE(value) OVER w, 2) AS lv, " +
        "ROUND(NTH_VALUE(value, 3) OVER w, 2) AS nv " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY user_id, event_id"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d).events
          .select(col("user_id"), col("event_id"),
            round2(first_value(col("value")).over(w)).as("fv"),
            round2(last_value(col("value")).over(w)).as("lv"),
            round2(nth_value(col("value"), 3).over(w)).as("nv"))
          .orderBy("user_id", "event_id")
      }),

    GraftQuery(
      "q15_distribution_windows",
      Some("SELECT c_custkey, ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) * 10000) / 10000 + 0 AS pr, " +
        "ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) * 10000) / 10000 + 0 AS cd " +
        "FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, d).customer
          .select(col("c_custkey"),
            graft.functions.round4(percent_rank().over(w)).as("pr"),
            graft.functions.round4(cume_dist().over(w)).as("cd"))
          .orderBy("c_custkey")
      }),

    GraftQuery(
      "q10_stats_agg",
      Some("SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity) * 10000) / 10000 + 0 AS sd, " +
        "ROUND(VAR_SAMP(l_quantity) * 10000) / 10000 + 0 AS vr " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => t(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          graft.functions.round4(stddev_samp(col("l_quantity"))).as("sd"),
          graft.functions.round4(var_samp(col("l_quantity"))).as("vr"))
        .orderBy("l_returnflag")),

    GraftQuery(
      // Catalyst plans this as TakeOrderedAndProject: per-partition top-k,
      // then a k-sized merge on the driver — no global sort at scale.
      "q17_topk",
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      (s, d) => t(s, d).orders
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    GraftQuery(
      "q18_union_all",
      Some("SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier ORDER BY k"),
      (s, d) => {
        val tb = t(s, d)
        tb.customer.select(col("c_nationkey").as("k"))
          .unionAll(tb.supplier.select(col("s_nationkey").as("k")))
          .orderBy("k")
      }),

    GraftQuery(
      "q18_union_distinct",
      Some("SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k"),
      (s, d) => {
        val tb = t(s, d)
        tb.customer.select(col("c_nationkey").as("k"))
          .union(tb.supplier.select(col("s_nationkey").as("k")))
          .distinct()
          .orderBy("k")
      }),

    GraftQuery(
      "q19_intersect",
      Some("SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY c_nationkey"),
      (s, d) => {
        val tb = t(s, d)
        tb.customer.select("c_nationkey")
          .intersect(tb.supplier.select(col("s_nationkey").as("c_nationkey")))
          .orderBy("c_nationkey")
      }),

    GraftQuery(
      "q19_except",
      Some("SELECT n_nationkey FROM nation EXCEPT SELECT c_nationkey FROM customer ORDER BY n_nationkey"),
      (s, d) => {
        val tb = t(s, d)
        tb.nation.select("n_nationkey")
          .except(tb.customer.select(col("c_nationkey").as("n_nationkey")))
          .orderBy("n_nationkey")
      }),

    GraftQuery(
      "q19_intersect_all",
      Some("SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY k"),
      (s, d) => {
        val tb = t(s, d)
        tb.customer.select(col("c_nationkey").as("k"))
          .intersectAll(tb.supplier.select(col("s_nationkey").as("k")))
          .orderBy("k")
      }),

    GraftQuery(
      "q15_ntile",
      Some("SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile " +
        "FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, d).customer
          .select(col("c_custkey"), ntile(4).over(w).as("quartile"))
          .orderBy("c_custkey")
      }),

    GraftQuery(
      "q10_corr_agg",
      Some("SELECT ROUND(CORR(l_quantity, l_extendedprice) * 10000) / 10000 + 0 AS c, " +
        "ROUND(COVAR_SAMP(l_quantity, l_extendedprice) * 100) / 100 + 0 AS cv FROM lineitem"),
      (s, d) => t(s, d).lineitem.agg(
        graft.functions.round4(corr(col("l_quantity"), col("l_extendedprice"))).as("c"),
        round2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cv"))),

    GraftQuery(
      "q20_string_fns3",
      Some("SELECT p_partkey, LPAD(p_brand, 12, '*') AS lp, RPAD(p_brand, 12, '*') AS rp, " +
        "REVERSE(p_name) AS rv, LEFT(p_type, 4) AS l4, RIGHT(p_type, 3) AS r3 " +
        "FROM part ORDER BY p_partkey"),
      (s, d) => t(s, d).part
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "*").as("rp"),
          reverse(col("p_name")).as("rv"),
          expr("LEFT(p_type, 4)").as("l4"),
          expr("RIGHT(p_type, 3)").as("r3"))
        .orderBy("p_partkey")),

    GraftQuery(
      "q24_array_slice",
      Some("SELECT vec_id, ROUND(CAST(embedding[1] AS DOUBLE) * 10000) / 10000 + 0 AS e1, " +
        "CAST(len(embedding[1:8]) AS INTEGER) AS n8 FROM embeddings ORDER BY vec_id"),
      (s, d) => t(s, d).embeddings
        .select(col("vec_id"),
          graft.functions.round4(element_at(col("embedding"), 1).cast("double")).as("e1"),
          size(slice(col("embedding"), 1, 8)).as("n8"))
        .orderBy("vec_id")),

    GraftQuery(
      "q20_string_fns",
      Some("SELECT p_partkey, UPPER(p_brand) AS brand_u, SUBSTRING(p_name, 1, 5) AS name5, " +
        "CAST(LENGTH(p_type) AS INTEGER) AS type_len FROM part ORDER BY p_partkey"),
      (s, d) => t(s, d).part
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_type")).as("type_len"))
        .orderBy("p_partkey")),

    GraftQuery(
      "q20_string_fns2",
      Some("SELECT p_partkey, CONCAT(p_brand, '-', p_type) AS bt, " +
        "REPLACE(p_name, ' ', '_') AS pn, TRIM(p_name) AS pt " +
        "FROM part ORDER BY p_partkey"),
      (s, d) => t(s, d).part
        .select(
          col("p_partkey"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("bt"),
          regexp_replace(col("p_name"), " ", "_").as("pn"),
          trim(col("p_name")).as("pt"))
        .orderBy("p_partkey")),

    GraftQuery(
      "q21_date_fns",
      Some("SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INTEGER) AS y, " +
        "CAST(MONTH(o_orderdate) AS INTEGER) AS m, " +
        "CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mstart FROM orders ORDER BY o_orderkey"),
      (s, d) => t(s, d).orders
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mstart"))
        .orderBy("o_orderkey")),

    GraftQuery(
      "q21_date_fns2",
      Some("SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS d30, " +
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS dd " +
        "FROM orders ORDER BY o_orderkey"),
      (s, d) => t(s, d).orders
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).as("d30"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("dd"))
        .orderBy("o_orderkey")),

    GraftQuery(
      "q22_math_case",
      Some("SELECT l_orderkey, l_linenumber, " +
        "ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS amt, " +
        "CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS sz " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
      (s, d) => t(s, d).lineitem
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round2(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("amt"),
          when(col("l_quantity") > 25, "big").otherwise("small").as("sz"))
        .orderBy("l_orderkey", "l_linenumber")),

    GraftQuery(
      "q23_json",
      Some("SELECT event_id, json_extract_string(props, '$.k') AS v FROM events ORDER BY event_id"),
      (s, d) => t(s, d).events
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("v"))
        .orderBy("event_id")),

    GraftQuery(
      "q24_array",
      Some("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n FROM embeddings ORDER BY vec_id"),
      (s, d) => t(s, d).embeddings
        .select(col("vec_id"), size(col("embedding")).as("n"))
        .orderBy("vec_id")),

    GraftQuery(
      // higher-order array functions: lambda-summed vector magnitude
      "q24_array_hof",
      Some("SELECT vec_id, ROUND(list_sum(CAST(embedding AS DOUBLE[])) * 10000) / 10000 + 0 AS ssum " +
        "FROM embeddings ORDER BY vec_id"),
      (s, d) => t(s, d).embeddings
        .select(col("vec_id"),
          graft.functions.round4(
            aggregate(col("embedding").cast("array<double>"), lit(0.0), (acc, x) => acc + x)).as("ssum"))
        .orderBy("vec_id")),

    GraftQuery(
      "q25_dedup_distinct",
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type"),
      (s, d) => t(s, d).events
        .select("event_type")
        .dropDuplicates("event_type")
        .orderBy("event_type")),

    GraftQuery(
      "q25_dedup_rows",
      Some("SELECT user_id, event_type, MIN(event_id) AS first_id FROM events " +
        "GROUP BY user_id, event_type ORDER BY user_id, event_type"),
      (s, d) => t(s, d).events
        .groupBy("user_id", "event_type")
        .agg(min("event_id").as("first_id"))
        .orderBy("user_id", "event_type")),

    GraftQuery(
      // Catalyst decorrelates this into a left outer aggregate join —
      // declared through the SQL surface (no DataFrame equivalent for a
      // correlated scalar subquery).
      "q33_correlated_subquery",
      Some("SELECT c_custkey, (SELECT ROUND(MAX(o_totalprice) * 100) / 100 FROM orders " +
        "WHERE o_custkey = c_custkey) AS max_order FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val tb = t(s, d)
        tb.registerViews()
        s.sql("SELECT c_custkey, (SELECT ROUND(MAX(o_totalprice) * 100) / 100 FROM orders " +
          "WHERE o_custkey = c_custkey) AS max_order FROM customer ORDER BY c_custkey")
      }),

    GraftQuery(
      "q34_null_fns",
      Some("SELECT event_id, COALESCE(NULLIF(event_type, 'error'), 'redacted') AS et " +
        "FROM events ORDER BY event_id"),
      (s, d) => t(s, d).events
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("redacted")).as("et"))
        .orderBy("event_id")),

    GraftQuery(
      // TPC-H Q3 shape (shipping priority): selective joins + agg + top-k
      "q31_tpch3_shape",
      Some("""SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) / 100 + 0 AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.customer.filter(col("c_mktsegment") === "BUILDING")
          .join(tb.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(tb.lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            col("o_orderdate").cast("date").as("odate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),

    GraftQuery(
      // TPC-H Q6 shape (forecast revenue): pure scan-filter-aggregate
      "q32_tpch6_shape",
      Some("SELECT ROUND(SUM(l_extendedprice * l_discount) * 100) / 100 + 0 AS revenue FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount >= 0.05 AND l_quantity < 24"),
      (s, d) => t(s, d).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .agg(round2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))),

    GraftQuery(
      // TPC-H Q5 shape (local supplier volume): the 6-way star join —
      // lineitem⋈orders⋈customer carry the volume; supplier adds the
      // co-nation condition (c_nationkey = s_nationkey, the join that
      // makes Q5 Q5); nation/region are broadcast dims. Catalyst pushes
      // the region filter and the orderdate range into the scans; AQE
      // picks broadcast sides at runtime.
      "q35_tpch5_shape",
      // Same order-independent integer-cents accumulation as q36: a
      // rounded double SUM depends on accumulation order, which differs
      // between Spark's partial aggregates and DuckDB.
      Some("""SELECT n_name,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.customer
          .join(tb.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(tb.lineitem, col("l_orderkey") === col("o_orderkey"))
          .join(tb.supplier, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(tb.nation, col("c_nationkey") === col("n_nationkey"))
          .join(tb.region.filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5))
            / 100.0).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    GraftQuery(
      // TPC-H Q10 shape (returned-item reporting): fact-side filter on
      // the return flag, quarter-bounded orders, revenue per customer,
      // top-20 — the classic "join big facts, group by a dimension key,
      // keep the head" report. TakeOrderedAndProject keeps the top-k
      // without a global sort.
      "q36_tpch10_shape",
      // Revenue accumulates as exact integer cents (floor(x*100 + 0.5)
      // per row — identical IEEE ops in both engines — then an exact
      // BIGINT sum): a double-sum's value depends on accumulation order,
      // and Spark's partial-aggregate order differs from DuckDB's, which
      // flipped a boundary row by one cent when rounding the final sum.
      Some("""SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
        |  n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.customer
          .join(tb.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(tb.lineitem.filter(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(tb.nation, col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5))
            / 100.0).as("revenue"))
          .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      }),

    GraftQuery(
      // TPC-H Q12 shape (shipping-mode priority classification, adapted
      // to this schema's columns: l_linestatus stands in for shipmode):
      // one fact join + conditional counts — pure integer aggregation,
      // no FP accumulation anywhere.
      "q37_tpch12_shape",
      Some("""SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.orders
          .join(tb.lineitem.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy("l_linestatus")
      }),

    GraftQuery(
      // TPC-H Q14 shape (promotion revenue share): numerator and
      // denominator both accumulate as exact integer cents, so the
      // final ratio divides the same two longs in both engines —
      // order-independent by construction.
      "q38_tpch14_shape",
      Some("""SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
        tb.lineitem.filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
          .join(tb.part, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", cents).otherwise(0L)).as("promo_cents"),
            sum(cents).as("total_cents"))
          .select(col("promo_cents"), col("total_cents"),
            (lit(100.0) * col("promo_cents") / col("total_cents")).as("promo_pct"))
      }),

    GraftQuery(
      // TPC-H Q4 shape (order priority checking): quarter-bounded orders
      // with an EXISTS over lineitem — a left-semi join whose condition
      // mixes the equi key with a non-equi comparison against the outer
      // row (l_shipdate > o_orderdate). The semi join stops probing a
      // build row at first match; only the key part shuffles.
      "q39_tpch4_shape",
      Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.orders
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .join(tb.lineitem,
            col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
            "leftsemi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      }),

    GraftQuery(
      // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
      // an OR-of-ANDs that references BOTH join sides, so the
      // disjunction itself can't push below the join. The per-side
      // envelopes (brand/size on part, quantity on lineitem) are stated
      // as explicit conjuncts — semantics-preserving, and they reach the
      // parquet scans as PushedFilters so the join only sees the
      // candidate slice. Integer-cents revenue as in q35/q36/q38.
      "q40_tpch19_shape",
      Some("""SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val part = tb.part.filter(
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") && col("p_size").between(1, 35))
        val li = tb.lineitem.filter(col("l_quantity").between(1, 40))
        li.join(part, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40)))
          .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5))
            / 100.0).as("revenue"))
      }),

    GraftQuery(
      // TPC-H Q1 shape (pricing summary): THE canonical scan-heavy
      // multi-aggregate — one pass over lineitem, six aggregates per
      // (returnflag, linestatus) group, all map-side partial. Money sums
      // use the integer-cents pattern (FLOOR(x*100+0.5)) so the FP sum
      // order can't produce engine-dependent last-bit drift (q35/q36
      // convention); averages go through the FP-path rounding helpers.
      "q41_tpch1_shape",
      Some("""SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_charge,
        |  ROUND(AVG(l_quantity) * 100) / 100 + 0 AS avg_qty,
        |  ROUND(AVG(l_discount) * 10000) / 10000 + 0 AS avg_disc,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => {
        def cents(c: org.apache.spark.sql.Column) = sum(floor(c * 100 + 0.5))
        t(s, d).lineitem
          .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round2(sum("l_quantity")).as("sum_qty"),
            (cents(col("l_extendedprice")) / 100.0).as("sum_base_price"),
            (cents(col("l_extendedprice") * (lit(1) - col("l_discount"))) / 100.0)
              .as("sum_disc_price"),
            (cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))) / 100.0).as("sum_charge"),
            round2(avg("l_quantity")).as("avg_qty"),
            round4(avg("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    GraftQuery(
      // TPC-H Q13 shape (customer order distribution): a LEFT OUTER join
      // whose non-key predicate lives in the JOIN condition (not the
      // WHERE — moving it would drop the zero-order customers), then a
      // two-level aggregation: orders per customer, customers per order
      // count. The outer join preserves every customer; count(o_orderkey)
      // counts only matched rows, so no-order customers land in the
      // c_count=0 bucket instead of disappearing.
      "q42_tpch13_shape",
      Some("""WITH c_orders AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.customer.join(tb.orders,
            col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
            "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      }),

    GraftQuery(
      // TPC-H Q7 shape (volume shipping): the 6-table snowflake join —
      // lineitem→orders→customer and lineitem→supplier, each side
      // resolving to its nation — with a cross-national filter and a
      // (supp_nation, cust_nation, year) rollup. The two nation dims
      // broadcast; only the fact-side keys shuffle.
      "q43_tpch7_shape",
      Some("""SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(cents) AS BIGINT) / 100.0 AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
        |    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |    JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE n1.n_name <> n2.n_name) q
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val n1 = tb.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = tb.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        tb.lineitem
          .join(tb.orders, col("o_orderkey") === col("l_orderkey"))
          .join(tb.supplier, col("s_suppkey") === col("l_suppkey"))
          .join(tb.customer, col("c_custkey") === col("o_custkey"))
          .join(broadcast(n1), col("s_nk") === col("s_nationkey"))
          .join(broadcast(n2), col("c_nk") === col("c_nationkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5))
            / 100.0).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }),

    GraftQuery(
      // TPC-H Q15 shape (top supplier): quarter-bounded revenue per
      // supplier, then the supplier(s) AT the maximum — an agg feeding a
      // scalar-max filter (Catalyst plans the max as a 1-row broadcast,
      // not a self-join recompute of the CTE).
      "q44_tpch15_shape",
      Some("""WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, cents / 100.0 AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE cents = (SELECT MAX(cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val revenue = tb.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5))
            .cast("long").as("cents"))
        val maxCents = revenue.agg(max("cents").as("max_cents"))
        tb.supplier.join(revenue, col("s_suppkey") === col("supplier_no"))
          .join(broadcast(maxCents), col("cents") === col("max_cents"))
          .select(col("s_suppkey"), col("s_name"), (col("cents") / 100.0).as("total_revenue"))
          .orderBy("s_suppkey")
      }),

    GraftQuery(
      // TPC-H Q17 shape (small-quantity-order revenue): the classic
      // correlated scalar subquery (per-part average quantity), written
      // Spark-first in its decorrelated form — a grouped avg joined back
      // on the part key — which is exactly the plan Catalyst's
      // decorrelation produces for the subquery formulation the oracle
      // uses.
      "q45_tpch17_shape",
      Some("""SELECT CAST(SUM(CAST(FLOOR(l1.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 / 7.0 AS avg_yearly
        |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l1.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        // The correlated avg is only needed for the brand's parts, so the
        // brand filter prunes BOTH branches before the per-part shuffle —
        // at scale this cuts the avg aggregation to 1/|brands| of
        // lineitem instead of shuffling every part's rows (decorrelation
        // alone would compute the avg over all parts).
        val brandParts = broadcast(tb.part.filter(col("p_brand") === "Brand#1")
          .select("p_partkey"))
        val brandLines = tb.lineitem
          .join(brandParts, col("p_partkey") === col("l_partkey"))
        val partAvg = brandLines.groupBy(col("l_partkey").as("pk"))
          .agg((avg("l_quantity") * 0.2).as("qty_limit"))
        brandLines
          .join(partAvg, col("pk") === col("l_partkey"))
          .filter(col("l_quantity") < col("qty_limit"))
          .agg((sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long") / 100.0 / 7.0)
            .as("avg_yearly"))
      }),

    GraftQuery(
      // TPC-H Q18 shape (large-volume customers): a HAVING over the
      // fact-side rollup (orders whose total quantity clears a
      // threshold) joined back to order + customer detail — the
      // aggregate prunes BEFORE the dimension joins, so only qualifying
      // orders shuffle into them.
      "q46_tpch18_shape",
      Some("""WITH big AS (
        |  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |SELECT c_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val big = tb.lineitem.groupBy("l_orderkey")
          .agg(sum("l_quantity").as("raw_qty"))
          .filter(col("raw_qty") > 300)
          .select(col("l_orderkey"), round2(col("raw_qty")).as("sum_qty"))
        big.join(tb.orders, col("o_orderkey") === col("l_orderkey"))
          .join(tb.customer, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"), col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
      }),

    GraftQuery(
      // PIVOT: long→wide reshape in ONE hash aggregate (Catalyst plans
      // groupBy.pivot as a single aggregate over casewhen projections —
      // no per-value rescans). The pivot values are EXPLICIT: omitting
      // them makes Spark run an eager distinct-collect job to discover
      // the domain before planning — the list is the 100 TB form.
      // Counts for absent (priority, status) cells coalesce to 0 to
      // match COUNT FILTER; sums stay NULL in both engines.
      "q55_pivot",
      Some("""SELECT o_orderpriority,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cents,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cents,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => t(s, d).orders
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5))
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
        .select(col("o_orderpriority"),
          coalesce(col("F_n"), lit(0L)).as("f_n"), col("F_cents").as("f_cents"),
          coalesce(col("O_n"), lit(0L)).as("o_n"), col("O_cents").as("o_cents"),
          coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_cents").as("p_cents"))
        .orderBy("o_orderpriority")),

    GraftQuery(
      // UNPIVOT/melt: wide→long reshape. Spark's unpivot is a zero-
      // shuffle Expand over the already-aggregated frame (2 output rows
      // per input row here) — the reshape itself never touches the fact
      // table. Integer-cents metrics keep the melted value column
      // exactly comparable.
      "q56_unpivot",
      Some("""WITH a AS (SELECT l_returnflag,
        |  CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'qty_cents' AS metric, qty_cents AS val FROM a
        |UNION ALL
        |SELECT l_returnflag, 'price_cents' AS metric, price_cents AS val FROM a
        |ORDER BY l_returnflag, metric""".stripMargin),
      (s, d) => t(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          sum(floor(col("l_quantity") * 100 + 0.5)).cast("long").as("qty_cents"),
          sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("price_cents"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty_cents"), col("price_cents")), "metric", "val")
        .orderBy("l_returnflag", "metric")),

    GraftQuery(
      // Count-min-sketch frequency estimation (operators/Frequency):
      // the sketch builds in one shuffle-free treeAggregate scan —
      // frequency estimates at 100 TB key cardinality without the
      // groupBy shuffle. Verified hl01-style: the exact top-10 keys
      // self-check the CMS guarantee (exact <= est <= exact + eps*N),
      // oracle recomputes the exact side.
      "cm01_heavy_hitters",
      Some("SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_exact, " +
        "CAST(1 AS BOOLEAN) AS within_band FROM lineitem " +
        "GROUP BY l_partkey ORDER BY n_exact DESC, l_partkey LIMIT 10"),
      (s, d) => graft.operators.Frequency
        .heavyHittersVerified(t(s, d).lineitem, "l_partkey", k = 10)
        .orderBy(col("n_exact").desc, col("l_partkey"))),

    GraftQuery(
      // FULL OUTER join — the one classic join type the q-series lacked
      // (q05 left, q06 semi, q07 anti, q08 cross, q09 theta). Both
      // inputs guarantee unmatched rows at every SF: customers without
      // orders survive only on the right, order-holders with
      // c_acctbal <= 5000 only on the left. The fact side is
      // pre-aggregated to one row per custkey BEFORE the join, so the
      // full-outer shuffle moves |customers| rows, not |orders| — at
      // 100 TB the aggregate runs map-side-partial first and the join
      // cost is bounded by key cardinality on both sides.
      "q57_join_full",
      Some("""SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey,
        |  n_orders, cents, c_mktsegment AS segment
        |FROM (SELECT o_custkey, COUNT(*) AS n_orders,
        |        CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |      FROM orders GROUP BY 1) o
        |FULL OUTER JOIN
        |     (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000) c
        |ON o.o_custkey = c.c_custkey
        |ORDER BY custkey""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val perCust = tb.orders
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
        val richCust = tb.customer
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"), col("c_mktsegment"))
        perCust
          .join(richCust, col("o_custkey") === col("c_custkey"), "full_outer")
          .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
            col("n_orders"), col("cents"), col("c_mktsegment").as("segment"))
          .orderBy("custkey")
      }),

    GraftQuery(
      // Streaming-unified tumbling window (same groupBy(window(...)) works
      // under readStream with a watermark); batch-checkable oracle.
      "q28_window_tumbling",
      Some("SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w, COUNT(*) AS n, " +
        "ROUND(SUM(value), 2) AS sv FROM events GROUP BY 1 ORDER BY 1"),
      (s, d) => t(s, d).events
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round2(sum("value")).as("sv"))
        .select(col("window.start").as("w"), col("n"), col("sv"))
        .orderBy("w"))
  )
}
