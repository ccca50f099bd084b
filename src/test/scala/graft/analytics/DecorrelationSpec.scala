package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** In-engine second oracle for the hand-decorrelated analytics queries:
  * each test runs the LITERAL correlated-subquery SQL through Spark's
  * own parser/optimizer (a completely different plan path — Spark plans
  * these with RewriteCorrelatedScalarSubquery / RewritePredicateSubquery,
  * not our window/argmin/two-level-agg shapes) and asserts row-for-row
  * equality with the DataFrame implementation. DuckDB already checks the
  * same SQL cross-engine; this pins the DECORRELATION itself, so a
  * future "optimization" that changes semantics (ties, null handling,
  * empty groups) fails here even if both engines agree on the SQL.
  */
class DecorrelationSpec extends SparkSpec {

  private lazy val views: Unit = graft.sources.Tables.registerAll(spark, sf)

  private def same(df: DataFrame, sql: String): Unit = {
    views
    val lit = spark.sql(sql)
    assert(df.columns.sorted.sameElements(lit.columns.sorted),
      s"column mismatch: ${df.columns.mkString(",")} vs ${lit.columns.mkString(",")}")
    val a = df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
    val b = lit.select(lit.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"rows differ: impl-only=${a.exceptAll(b).count()}, sql-only=${b.exceptAll(a).count()}")
  }

  test("q4: semi-join with non-equi predicate == literal EXISTS") {
    same(Analytics.q4OrderPriority(spark, sf),
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  test("q17: one-window decorrelation == literal correlated scalar subqueries") {
    same(Analytics.q17SmallQty(spark, sf),
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND 5 * CAST(l_quantity AS BIGINT)
        |        * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |      < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
  }

  test("q21: two-level aggregation == literal double EXISTS / NOT EXISTS") {
    // the literal form works per l1 ROW; collapsing to DISTINCT
    // (supplier, order) pairs before counting gives the per-order
    // semantic the two-level aggregation computes
    same(Analytics.q21WaitingSupplier(spark, sf),
      """WITH waiting AS (
        |  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        |  FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |  WHERE o.o_orderstatus = 'F' AND l1.l_shipdate > o.o_orderdate
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_shipdate > o.o_orderdate))
        |SELECT s_name, COUNT(*) AS numwait
        |FROM waiting JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC LIMIT 10""".stripMargin)
  }

  test("q2: argmin aggregate == window row_number over the literal ordering") {
    same(Analytics.q2MinCost(spark, sf),
      """SELECT p_brand, s_name, CAST(cents AS DOUBLE) / 100 AS min_price,
        |       l_partkey AS best_part
        |FROM (SELECT p_brand, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
        |             l_suppkey, l_partkey,
        |             ROW_NUMBER() OVER (PARTITION BY p_brand
        |               ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT), l_suppkey, l_partkey) AS rn
        |      FROM lineitem JOIN part ON l_partkey = p_partkey) t
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1""".stripMargin)
  }

  test("q11: one-row broadcast scalar == literal uncorrelated scalar subqueries") {
    same(Analytics.q11PartValueShare(spark, sf),
      """WITH per_part AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
        |FROM per_part
        |WHERE value * (SELECT COUNT(*) FROM per_part) > (SELECT SUM(value) FROM per_part)""".stripMargin)
  }

  test("q15: global-window max == literal scalar MAX subquery") {
    same(Analytics.q15TopSupplier(spark, sf),
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin)
  }

  test("q18: broadcast having-rollup == literal correlated scalar subquery") {
    // NOTE: a SELECT-position correlated aggregate goes through Spark's
    // count-bug handling, whose Union's constraint rewrite throws
    // NoSuchElementException in 4.1 (upstream bug, any formulation with
    // the scalar in the projection) — run with constraint propagation
    // off; the decorrelation under test is unaffected
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try doQ18() finally
      spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
  }

  private def doQ18(): Unit = {
    same(Analytics.q18TopBuyers(spark, sf),
      """SELECT c_name, o_orderkey, o_totalprice, sum_qty
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
        |        (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem
        |         WHERE l_orderkey = o_orderkey) AS sum_qty
        |      FROM orders) o
        |JOIN customer ON c_custkey = o_custkey
        |WHERE sum_qty > 300""".stripMargin)
  }

  test("q20: windowed share threshold == literal correlated HAVING subquery") {
    same(Analytics.q20ExcessSuppliers(spark, sf),
      """SELECT DISTINCT s_suppkey, s_name
        |FROM supplier JOIN (
        |  SELECT l.l_partkey, l.l_suppkey
        |  FROM lineitem l JOIN part ON l.l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l.l_partkey, l.l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) * 10 >
        |    (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |     FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
        |     WHERE p2.p_name LIKE 'red%'
        |       AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |       AND l2.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |       AND l2.l_partkey = l.l_partkey) * 3
        |) q ON l_suppkey = s_suppkey""".stripMargin)
  }

  test("q22: broadcast scalar + anti join == literal scalar subquery + NOT EXISTS") {
    same(Analytics.q22IdleBalance(spark, sf),
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
        |        * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
        |      > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin)
  }
}
