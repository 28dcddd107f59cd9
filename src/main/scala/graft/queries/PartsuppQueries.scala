package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The eight TPC-H shapes that need the derived `partsupp` table (or the
  * columns the driver testdata lacks), closing the VERDICT-r7 query-surface
  * gap: TPC-H 2, 8, 9, 11, 16, 20, 21, 22 adapted to the testdata's
  * columns (see each query's comment for the adaptation).
  *
  * `partsupp` itself is `Tables.partsupp`: a deterministic pure-integer
  * derivation from part x supplier x lineitem, materialized to a parquet
  * fixture for the Spark side and recomputed as the [[psCte]] CTE by the
  * DuckDB oracle — the hash gate proves fixture == derivation every run.
  *
  * Decorrelation-heavy shapes (Q2's correlated MIN, Q20's correlated SUM
  * inside IN, Q21's EXISTS/NOT EXISTS pair, Q22's scalar-avg + NOT EXISTS)
  * are declared through the SQL surface so Catalyst's subquery
  * decorrelation plans them; the aggregation/join shapes (Q8, Q9, Q11,
  * Q16) are DataFrame-first with explicit broadcasts on dimension sides.
  *
  * All money aggregations use the exact-integer-cents pattern established
  * by q35/q36: FLOOR(x*100 + 0.5) per row (identical IEEE ops in both
  * engines), exact BIGINT sum, final division — a rounded double SUM
  * depends on accumulation order, which differs between Spark's partial
  * aggregates and DuckDB.
  */
object PartsuppQueries {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** Oracle-side partsupp derivation — MUST stay in lockstep with
    * `Tables.derivePartsupp` (PartsuppQueriesSpec pins the equivalence by
    * evaluating this very text in Spark SQL against the fixture). */
  val psCte: String =
    """WITH ps_pairs AS (
      |  SELECT DISTINCT ps_partkey, ps_suppkey FROM (
      |    SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
      |           (CAST(p_partkey AS BIGINT) * 7 + i.i * 13) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey
      |    FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS i(i)
      |    UNION ALL
      |    SELECT CAST(l_partkey AS BIGINT), CAST(l_suppkey AS BIGINT) FROM lineitem
      |  ) raw_pairs
      |),
      |partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS INTEGER) AS ps_availqty,
      |         CAST((ps_partkey * 13 + ps_suppkey * 7) % 99900 + 100 AS BIGINT) / CAST(1000 AS DOUBLE) AS ps_supplycost
      |  FROM ps_pairs
      |)""".stripMargin

  /** Register the base views plus the materialized partsupp fixture for
    * the SQL-surface queries. */
  private def withViews(s: SparkSession, d: String): Tables = {
    val tb = t(s, d)
    tb.registerViews()
    tb.partsupp.createOrReplaceTempView("partsupp")
    tb
  }

  /** Exact integer cents of a money expression — same IEEE double ops in
    * Spark and DuckDB, then order-independent BIGINT accumulation. */
  private def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + 0.5).cast("bigint")

  // SQL-surface shapes: ONE text per query, used verbatim as both the
  // DuckDB oracle (prefixed with psCte where partsupp is needed) and the
  // spark.sql input — the two can no longer drift (review r8).
  private val q47Sql =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
      |FROM part, supplier, partsupp, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_type = 'LARGE' AND p_size <= 25
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  AND ps_supplycost = (SELECT MIN(ps2.ps_supplycost)
      |    FROM partsupp ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  private val q52Sql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp ps
      |  WHERE ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red gear%')
      |    AND ps.ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
      |      WHERE l_partkey = ps.ps_partkey AND l_suppkey = ps.ps_suppkey
      |        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'))
      |ORDER BY s_suppkey""".stripMargin

  private val q53Sql =
    """WITH lo AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier, lo l1
      |WHERE s_suppkey = l1.l_suppkey
      |  AND l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lo l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  private val q54Sql =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey % 5 AS cntrycode,
      |         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      |  FROM customer)
      |SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      |       CAST(SUM(bal_cents) AS BIGINT) / CAST(100 AS DOUBLE) AS totacctbal
      |FROM cust
      |WHERE cntrycode IN (1, 2, 3)
      |  AND bal_cents > (SELECT AVG(bal_cents) FROM cust
      |                   WHERE bal_cents > 0 AND cntrycode IN (1, 2, 3))
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = cust.c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      // TPC-H Q2 shape (min-cost supplier): the correlated scalar MIN over
      // a 4-table subquery is THE decorrelation stress test — Catalyst
      // rewrites it to an aggregate-below-join on p_partkey. Adaptations:
      // p_brand stands in for the absent p_mfgr; the size/type filter is
      // widened so sf0.001 still returns rows (p_size<=25, p_type='LARGE').
      "q47_tpch2_shape",
      Some(psCte + "\n" + q47Sql),
      (s, d) => { withViews(s, d); s.sql(q47Sql) }),

    GraftQuery(
      // TPC-H Q8 shape (national market share): the 8-table star with two
      // roles for nation (customer side filters the region, supplier side
      // names the market-share nation). Share = ratio of two exact
      // BIGINT cents sums -> identical double division in both engines.
      "q48_tpch8_shape",
      Some("""
        |SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |  / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mkt_share
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n1.n_regionkey
        |JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_year ORDER BY o_year""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val custNation = tb.nation
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
        val suppNation = tb.nation
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val vol = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
        tb.lineitem
          .join(tb.part.filter(col("p_type") === "ECONOMY").select("p_partkey"),
            col("p_partkey") === col("l_partkey"))
          .join(tb.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
          .join(tb.customer, col("c_custkey") === col("o_custkey"))
          .join(broadcast(custNation), col("cn_key") === col("c_nationkey"))
          .join(broadcast(tb.region.filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .join(tb.supplier, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(suppNation), col("sn_key") === col("s_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0L))
            / sum(vol)).as("mkt_share"))
          .orderBy("o_year")
      }),

    GraftQuery(
      // TPC-H Q9 shape (product-type profit): lineitem joins partsupp on
      // the COMPOSITE (partkey, suppkey) key — total by construction
      // (every lineitem pair exists in partsupp). Profit per row is
      // floored to exact cents before the BIGINT sum.
      "q49_tpch9_shape",
      Some(psCte + """
        |SELECT nation, o_year, CAST(SUM(amount_cents) AS BIGINT) / CAST(100 AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(FLOOR((l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity) * 100 + 0.5) AS BIGINT) AS amount_cents
        |  FROM lineitem, part, supplier, partsupp, orders, nation
        |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
        |    AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        tb.lineitem
          .join(tb.part.filter(col("p_name").like("%red%")).select("p_partkey"),
            col("p_partkey") === col("l_partkey"))
          .join(tb.partsupp, col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
          .join(tb.supplier, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(tb.nation), col("n_nationkey") === col("s_nationkey"))
          .join(tb.orders, col("o_orderkey") === col("l_orderkey"))
          .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
              - col("ps_supplycost") * col("l_quantity")).as("amount_cents"))
          .groupBy("nation", "o_year")
          .agg((sum("amount_cents") / 100.0).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      }),

    GraftQuery(
      // TPC-H Q11 shape (important stock): group-total vs grand-total on
      // the same filtered derivation. The grand total is a 1-row aggregate
      // broadcast against the groups (the idiomatic decorrelation of
      // Q11's HAVING scalar subquery). Value arithmetic is exact milli
      // units: FLOOR(cost*1000 + 0.5) recovers the integer the derivation
      // embedded, so sums are order-independent BIGINTs.
      "q50_tpch11_shape",
      Some(psCte + """,
        |valued AS (
        |  SELECT ps_partkey, CAST(FLOOR(ps_supplycost * 1000 + 0.5) AS BIGINT) * ps_availqty AS value_milli
        |  FROM partsupp, supplier, nation
        |  WHERE s_suppkey = ps_suppkey AND n_nationkey = s_nationkey AND n_name = 'NATION_3')
        |SELECT ps_partkey, CAST(SUM(value_milli) AS BIGINT) / CAST(1000 AS DOUBLE) AS stock_value
        |FROM valued GROUP BY ps_partkey
        |HAVING SUM(value_milli) > (SELECT SUM(value_milli) / CAST(500 AS DOUBLE) FROM valued)
        |ORDER BY stock_value DESC, ps_partkey""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val valued = tb.partsupp
          .join(tb.supplier, col("s_suppkey") === col("ps_suppkey"))
          .join(broadcast(tb.nation.filter(col("n_name") === "NATION_3")),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("ps_partkey"),
            (floor(col("ps_supplycost") * 1000 + 0.5).cast("bigint")
              * col("ps_availqty")).as("value_milli"))
        val threshold = valued.agg((sum("value_milli") / 500.0).as("threshold"))
        valued.groupBy("ps_partkey")
          .agg(sum("value_milli").as("group_milli"))
          .crossJoin(broadcast(threshold))
          .filter(col("group_milli") > col("threshold"))
          .select(col("ps_partkey"), (col("group_milli") / 1000.0).as("stock_value"))
          .orderBy(col("stock_value").desc, col("ps_partkey"))
      }),

    GraftQuery(
      // TPC-H Q16 shape (supplier-count by part attributes): NOT IN over
      // a tiny supplier subset -> broadcast anti-join, then a distinct
      // aggregate over the surviving pairs. s_name LIKE stands in for the
      // absent s_comment filter.
      "q51_tpch16_shape",
      Some(psCte + """
        |SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM partsupp, part
        |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
      (s, d) => {
        val tb = t(s, d)
        val excluded = tb.supplier.filter(col("s_name").like("%7")).select("s_suppkey")
        tb.partsupp
          .join(tb.part.filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)),
            col("p_partkey") === col("ps_partkey"))
          .join(broadcast(excluded), col("s_suppkey") === col("ps_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      }),

    GraftQuery(
      // TPC-H Q20 shape (potential part promotion): semi-join nest with a
      // correlated SUM — suppliers holding more stock of a 'red gear%'
      // part than half of what they shipped of it in 1997. The correlated
      // aggregate decorelates to an aggregate-join on the composite key;
      // pairs with no 1997 shipments yield NULL > comparisons (excluded)
      // in both engines. Deliberately selective at the gate sf (67/100
      // suppliers) so a wrongly-total subquery cannot hash-match.
      "q52_tpch20_shape",
      Some(psCte + "\n" + q52Sql),
      (s, d) => { withViews(s, d); s.sql(q52Sql) }),

    GraftQuery(
      // TPC-H Q21 shape (suppliers who kept orders waiting): the
      // EXISTS / NOT EXISTS pair over the same fact table. Adaptation:
      // the testdata has no l_receiptdate/l_commitdate, so "late" is
      // l_shipdate > o_orderdate + 60 days, precomputed in the `lo` CTE
      // so the NOT EXISTS correlates only on l_orderkey (the true Q21
      // shape: equality correlation + inner-only predicate).
      "q53_tpch21_shape",
      Some(q53Sql),
      (s, d) => { t(s, d).registerViews(); s.sql(q53Sql) }),

    GraftQuery(
      // TPC-H Q22 shape (global sales opportunity): scalar-average
      // threshold + anti-correlated NOT EXISTS. Adaptations: cntrycode is
      // c_nationkey % 5 (no c_phone in the testdata); "has no orders"
      // becomes "no orders since 2000-01-01" (every testdata customer has
      // at least one order, unlike real TPC-H). Balances compare as exact
      // integer cents; AVG(BIGINT) is the same correctly-rounded double
      // in both engines.
      "q54_tpch22_shape",
      Some(q54Sql),
      (s, d) => { t(s, d).registerViews(); s.sql(q54Sql) }),

    GraftQuery(
      // Exact triangle counting + global clustering coefficient (tc01)
      // over the shared-supplier part graph (parts are adjacent when a
      // low-stock supplier carries both — ps_availqty < 100 keeps the
      // co-supply cliques small). operators/Triangles: degree-ordered
      // orientation makes the work O(m^1.5) whatever the skew and
      // counts each triangle exactly once; the oracle recomputes via
      // the canonical a<b<c three-way join (a different but equivalent
      // formulation — agreement is algorithm-independent evidence) and
      // Σ C(deg,2) wedges.
      "tc01_triangles",
      Some(psCte + """,
        |ps AS (SELECT ps_suppkey AS sk, ps_partkey AS pk FROM partsupp WHERE ps_availqty < 100),
        |e AS (SELECT DISTINCT a.pk AS a, b.pk AS b FROM ps a JOIN ps b ON a.sk = b.sk AND a.pk < b.pk),
        |deg AS (SELECT n, COUNT(*) AS deg FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) q GROUP BY 1),
        |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |st AS (SELECT
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |    (SELECT CAST(COALESCE(SUM((deg * (deg - 1)) // 2), 0) AS BIGINT) FROM deg) AS n_wedges,
        |    (SELECT t FROM tri) AS n_triangles)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CASE WHEN n_wedges > 0 THEN
        |    ROUND((CAST(n_triangles * 3 AS DOUBLE) / CAST(n_wedges AS DOUBLE)) * 1000000) / 1000000 + 0
        |  END AS gcc
        |FROM st""".stripMargin),
      (s, d) => {
        val ps = t(s, d).partsupp.filter(col("ps_availqty") < 100)
          .select(col("ps_suppkey").as("sk"), col("ps_partkey").as("pk"))
        val e = ps.as("x").join(ps.as("y"),
            col("x.sk") === col("y.sk") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
        graft.operators.Triangles.triangleStats(e)
      }),

    GraftQuery(
      // Per-node triangle counts + local clustering coefficient (tc02,
      // Triangles.localClustering) over tc01's shared-supplier part
      // graph. Same degree-ordered orientation (each triangle
      // materializes once, O(m^1.5) wedge work); attribution is one
      // explode + node-keyed count. Oracle recomputes via the
      // canonical a<b<c three-way join and attributes each triangle to
      // its three corners — algorithm-independent agreement, as tc01.
      "tc02_clustering_coeff",
      Some(psCte + """,
        |ps AS (SELECT ps_suppkey AS sk, ps_partkey AS pk FROM partsupp WHERE ps_availqty < 100),
        |e AS (SELECT DISTINCT a.pk AS a, b.pk AS b FROM ps a JOIN ps b ON a.sk = b.sk AND a.pk < b.pk),
        |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) q GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS n_tri
        |  FROM (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        |        UNION ALL SELECT z FROM tri) q GROUP BY 1)
        |SELECT d.n AS node, d.deg, COALESCE(pn.n_tri, 0) AS n_tri,
        |  ROUND(CAST(2 * COALESCE(pn.n_tri, 0) AS DOUBLE)
        |    / CAST(d.deg * (d.deg - 1) AS DOUBLE) * 1000000) / 1000000 + 0 AS lcc
        |FROM deg d LEFT JOIN pn ON d.n = pn.n
        |WHERE d.deg >= 2 ORDER BY node""".stripMargin),
      (s, d) => {
        val ps = t(s, d).partsupp.filter(col("ps_availqty") < 100)
          .select(col("ps_suppkey").as("sk"), col("ps_partkey").as("pk"))
        val e = ps.as("x").join(ps.as("y"),
            col("x.sk") === col("y.sk") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
        graft.operators.Triangles.localClustering(e).orderBy("node")
      })
  )
}
