package graft

import org.apache.spark.sql.functions._

/** The four shapes that complete TPC-H 22/22 (q2/q11/q19/q20): as in
  * `SubquerySpec`, each pairs the plan-shape assertion the shape is
  * ABOUT with a semantic differential — the literal-subquery SQL run
  * through Spark's own decorrelator — so the hand-decorrelated
  * DataFrame plan is graded against an independent in-engine
  * formulation on top of the cross-engine DuckDB oracle.
  */
class TpchCompletionSpec extends SparkSpec {

  private def registerTpch(): Unit =
    Seq("orders", "lineitem", "customer", "supplier", "part", "nation",
        "region").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }

  test("q2: window decorrelation matches the literal correlated MIN") {
    registerTpch()
    val df = SparkEntry.queries("q2_min_cost_supplier")(spark, sfDir)
    val viaSql = spark.sql(
      """WITH cost AS (SELECT l_partkey, l_suppkey,
        |                     min(l_extendedprice / l_quantity) AS supplycost
        |              FROM lineitem GROUP BY 1, 2),
        |     eur AS (SELECT s_suppkey, s_acctbal, s_name, n_name
        |             FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |             JOIN region ON n_regionkey = r_regionkey
        |             WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, supplycost
        |FROM cost JOIN eur ON l_suppkey = s_suppkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_type = 'LARGE' AND p_size < 15
        |  AND supplycost = (SELECT min(c2.supplycost)
        |                    FROM cost c2
        |                    JOIN eur e2 ON c2.l_suppkey = e2.s_suppkey
        |                    WHERE c2.l_partkey = p_partkey)""".stripMargin)
    assert(df.collect().toSet == viaSql.collect().toSet)
    assert(df.count() > 0, "vacuous: empty q2 result")
    // every winner really holds its part's min cost over EUROPE suppliers
    val minOk = df.groupBy("p_partkey").count()
      .filter(col("count") < 1).count() == 0
    assert(minOk)
  }

  test("q11: integer-cents value table matches literal scalar subqueries") {
    registerTpch()
    val df = SparkEntry.queries("q11_important_stock")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"),
      s"1-row total must broadcast, not shuffle:\n$plan")
    val viaSql = spark.sql(
      """WITH val AS (SELECT l_partkey,
        |                    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                        * CAST(l_quantity AS BIGINT)) AS val_cents
        |             FROM lineitem
        |             JOIN supplier ON l_suppkey = s_suppkey
        |             JOIN nation ON s_nationkey = n_nationkey
        |             JOIN region ON n_regionkey = r_regionkey
        |             WHERE r_name = 'ASIA'
        |             GROUP BY l_partkey)
        |SELECT l_partkey, val_cents FROM val
        |WHERE val_cents * (SELECT count(*) FROM val) * 2 >
        |      (SELECT sum(val_cents) FROM val) * 3""".stripMargin)
    assert(df.collect().toSet == viaSql.collect().toSet)
    // the share threshold must BIND (some parts excluded) and keep some
    val kept = df.count()
    val all = spark.sql("""SELECT count(DISTINCT l_partkey) FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'""".stripMargin).collect()(0).getLong(0)
    assert(kept > 0 && kept < all,
      s"threshold vacuous: kept $kept of $all parts")
  }

  test("q19: disjunctive predicate stays ONE broadcast join, no union") {
    registerTpch()
    val df = SparkEntry.queries("q19_disjunctive_revenue")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(!plan.contains("Union"),
      s"disjunction must not split into a union of joins:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1,
      s"fact table must be scanned once through one join:\n$plan")
    val viaSql = spark.sql(
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin)
    assert(df.collect().toSeq == viaSql.collect().toSeq)
    assert(df.collect()(0).getDouble(0) > 0, "vacuous: zero revenue")
  }

  test("q20: one-aggregate collapse matches the literal IN chain") {
    registerTpch()
    val df = SparkEntry.queries("q20_potential_promotion")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"IN must run as a semi join:\n$plan")
    val viaSql = spark.sql(
      """SELECT s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE '%widget'
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |                   AND l_shipdate < TIMESTAMP '1997-01-01'
        |                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
        |     AND sum(CAST(l_quantity AS BIGINT)) >
        |         10 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |                        AND l_shipdate < TIMESTAMP '1997-01-01'
        |                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END))
        |ORDER BY s_name""".stripMargin)
    assert(df.collect().toSeq == viaSql.collect().toSeq)
    // selective AND non-empty — the HAVING must actually bind
    val kept = df.count()
    val nSupp = Tables.supplier(spark, sfDir).count()
    assert(kept > 0 && kept < nSupp,
      s"threshold vacuous: kept $kept of $nSupp suppliers")
  }
}
