package graft

import graft.ops.Joins
import graft.streaming.StreamOps

/** Runtime Bloom-filter join pruning — the "bloom side-channel at scale"
  * the q18 plan notes point to, now the graded `j9_bloom_join` seat. When
  * a selective derived key set meets a fact table in a SHUFFLE join (too
  * big to broadcast at 100 TB), Spark's InjectRuntimeFilter builds a
  * Bloom filter over the creation side's join keys and pushes
  * `might_contain` onto the fact-side scan — rows that cannot join die
  * before the exchange instead of shuffling. The production thresholds
  * (10 GB application-side scan) are exactly what a 100 TB fact table
  * clears naturally; the spec scales them to the fixture
  * ([[Joins.bloomConfs]]) to pin the MECHANISM and its semantic
  * neutrality on the SAME plan the graded query materializes. */
class BloomFilterJoinSpec extends SparkSpec {

  private def plan() =
    Joins.bloomJoinPlan(Tables.lineitem(spark, sfDir),
                        Tables.orders(spark, sfDir))

  test("InjectRuntimeFilter pushes might_contain onto the fact side") {
    StreamOps.withConf(spark, Joins.bloomConfs) {
      val opt = plan().queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected a runtime bloom probe on the fact side:\n${opt.take(1500)}")
      assert(opt.contains("bloom_filter_agg"),
        s"expected a bloom build over the creation side keys:\n${opt.take(1500)}")
    }
  }

  test("bloom pruning is semantically neutral: same result with it off") {
    // the graded entry point (materializes INSIDE the conf scope)
    val withBloom = Joins
      .bloomPrunedJoin(spark, Tables.lineitem(spark, sfDir),
                       Tables.orders(spark, sfDir))
      .orderBy("o_orderkey").collect().toSeq
    val without = {
      val q = plan()
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("might_contain"),
        "default session confs must not inject the bloom filter")
      q.orderBy("o_orderkey").collect().toSeq
    }
    assert(withBloom.nonEmpty && withBloom == without)
  }

  test("conf scoping: the session is back to defaults after the graded query") {
    val key =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val before = spark.conf.get(key)
    assert(before != "0", "precondition: the scoped override is not the default")
    Joins.bloomPrunedJoin(spark, Tables.lineitem(spark, sfDir),
                          Tables.orders(spark, sfDir)).count()
    assert(spark.conf.get(key) == before,
      "the conf scope must restore the session default")
  }
}
