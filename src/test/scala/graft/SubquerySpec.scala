package graft

import org.apache.spark.sql.functions._

/** The TPC-H subquery family (q4/q13/q16/q17/q21/q22 shapes): each entry
  * pairs a plan-shape assertion (the join strategy the shape is ABOUT)
  * with a semantic differential — the same query restated through
  * Spark's own subquery decorrelator (`spark.sql` with literal
  * EXISTS / correlated scalar subqueries), so the hand-decorrelated
  * DataFrame plans are graded against an independent in-engine
  * formulation on top of the cross-engine DuckDB oracle.
  */
class SubquerySpec extends SparkSpec {

  private def registerTpch(): Unit =
    Seq("orders", "lineitem", "customer", "supplier", "part").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }

  test("q4: EXISTS runs as a left semi join, matches literal EXISTS") {
    registerTpch()
    val df = SparkEntry.queries("q4_order_priority")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R'
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
    assert(df.collect().toSet == viaSql.collect().toSet)
    assert(df.count() > 0, "vacuous: empty q4 result")
  }

  test("q13: zero-order customers survive the outer join; counts total") {
    val rows = SparkEntry.queries("q13_customer_distribution")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.values.sum == nCust,
      s"distribution must partition all $nCust customers: $rows")
    // the zero bucket must equal an independently-computed anti join —
    // and must be non-empty, else the null-extension is ungraded
    val expectedZero = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
              .filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(expectedZero > 0, "fixture regression: no zero-order customers")
    assert(rows.getOrElse(0L, 0L) == expectedZero,
      s"zero bucket ${rows.get(0L)} != anti-join count $expectedZero")
  }

  test("q16: NOT IN runs as a broadcast anti join, matches literal NOT IN") {
    registerTpch()
    val df = SparkEntry.queries("q16_supplier_count")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dims must broadcast:\n$plan")
    val viaSql = spark.sql(
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin)
    assert(df.collect().toSet == viaSql.collect().toSet)
  }

  test("q17: window decorrelation matches the correlated scalar subquery") {
    registerTpch()
    val df = SparkEntry.queries("q17_small_quantity")(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
    assert(df.collect().toSeq == viaSql.collect().toSeq)
    // the one wide exchange is the l_partkey window; the part-side join
    // must broadcast (no SMJ), and no OTHER key is ever hashed on
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"part side must broadcast:\n$plan")
    val hashKeys = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .map(_.replaceAll(".*hashpartitioning\\(([a-z_]+)#.*", "$1")).toSet
    assert(hashKeys.subsetOf(Set("l_partkey")),
      s"unexpected exchange keys $hashKeys:\n$plan")
  }

  test("q21: per-order aggregate matches literal EXISTS/NOT EXISTS pair") {
    registerTpch()
    val df = SparkEntry.queries("q21_waiting_supplier")(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin)
    assert(df.collect().toSeq == viaSql.collect().toSeq)
    assert(df.count() > 0, "vacuous: empty q21 result")
  }

  test("q22: scalar-average broadcast + anti join shape and semantics") {
    val df = SparkEntry.queries("q22_sales_opportunity")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"1-row scalar must broadcast:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    // every reported customer really lacks an urgent order and the
    // result is non-empty (else the anti join is ungraded)
    val custNoUrgent = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
              .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
    val reported = df.agg(sum("numcust")).collect()(0).getLong(0)
    assert(reported > 0 && reported <= custNoUrgent.count())
  }
}
