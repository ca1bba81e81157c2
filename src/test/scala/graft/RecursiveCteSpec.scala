package graft

/** Spark 4's WITH RECURSIVE (UnionLoop executor) — the `s6b_recursive_cte`
  * seat. The recursion is kept acyclic by construction (every near-dup
  * edge is oriented doc_a < doc_b), because the recursive term only
  * supports UNION ALL: on a cyclic graph that never terminates short of
  * the engine's level limit, while on the ascending DAG it enumerates
  * each ascending path at most once and the hop bound is a depth cap,
  * not a correctness crutch. */
class RecursiveCteSpec extends SparkSpec {
  import spark.implicits._

  private def closure(view: String) = spark.sql(
    s"""WITH RECURSIVE reach AS (
       |  SELECT doc_a AS src, doc_b AS dst, 1 AS hop FROM $view
       |  UNION ALL
       |  SELECT r.src, e.doc_b, r.hop + 1
       |  FROM reach r JOIN $view e ON e.doc_a = r.dst
       |  WHERE r.hop < 3
       |)
       |SELECT src AS doc_id, count(DISTINCT dst) AS n_reach
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin)

  test("bounded ascending closure: exact counts on a crafted DAG") {
    // 1→2→3→4 plus shortcut 1→3; separate edge 10→11. Within 3 hops:
    // 1 reaches {2,3,4}, 2 reaches {3,4}, 3 reaches {4}, 10 reaches {11}.
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b").createOrReplaceTempView("g_rcte_fixture")
    val got = closure("g_rcte_fixture").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 10L -> 1L))
  }

  test("the plan runs Spark's recursive executor (UnionLoop)") {
    Seq((1L, 2L)).toDF("doc_a", "doc_b")
      .createOrReplaceTempView("g_rcte_fixture2")
    val plan = closure("g_rcte_fixture2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"),
      s"expected the UnionLoop recursion node:\n${plan.take(1200)}")
  }

  test("hop bound caps depth: a 5-chain stops at 3 ascending hops") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b").createOrReplaceTempView("g_rcte_fixture3")
    val got = closure("g_rcte_fixture3").as[(Long, Long)].collect().toMap
    // node 1: {2,3,4} only — 5 and 6 sit past the 3-hop cap
    assert(got(1L) === 3L && got(3L) === 3L && got(5L) === 1L)
  }
}
