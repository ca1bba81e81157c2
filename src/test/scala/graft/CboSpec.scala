package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import graft.ops.Storage
import graft.streaming.StreamOps

/** Cost-based optimization over ANALYZEd catalog tables — the
  * `storage_cbo_stats` seat. ANALYZE must land row counts + column
  * stats in the catalog, and with CBO + join reorder on, the star join
  * written fact-first must be re-planned so the selective dim join
  * happens before the fact table — FROM-clause order is exactly what a
  * 100 TB engine cannot trust users to get right. */
class CboSpec extends SparkSpec {

  private def innermostJoin(p: LogicalPlan): Join = {
    val joins = p.collect { case j: Join => j }
    assert(joins.nonEmpty, s"expected at least one join:\n$p")
    joins.last
  }

  private def leavesOf(p: LogicalPlan): String =
    p.collectLeaves().map(_.toString).mkString("\n")

  test("ANALYZE lands rowCount + column stats in the catalog") {
    val t = Storage.cboTables(spark, sfDir,
      Map("orders" -> Seq("o_orderkey", "o_custkey")))
    StreamOps.withConf(spark, Storage.cboConfs) {
      val stats = spark.table(t("orders")).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined && stats.rowCount.get.toLong > 0,
        s"catalog row count must reach the optimizer: $stats")
      assert(stats.attributeStats.nonEmpty,
        s"column-level stats must reach the optimizer: $stats")
    }
  }

  test("CBO reorders the star join: the filtered dim joins before the fact") {
    // syntactic order is (lineitem ⋈ orders) ⋈ customer — fact-first
    val off = innermostJoin(
      Storage.cboStarJoinPlan(spark, sfDir).queryExecution.optimizedPlan)
    assert(leavesOf(off).contains("lineitem"),
      s"without CBO the syntactic fact-first order must survive:\n$off")
    StreamOps.withConf(spark, Storage.cboConfs) {
      val on = innermostJoin(
        Storage.cboStarJoinPlan(spark, sfDir).queryExecution.optimizedPlan)
      assert(!leavesOf(on).contains("lineitem"),
        s"with stats + CBO the innermost join must avoid the fact table:\n$on")
    }
  }

  test("the graded query equals the stats-free plan's result") {
    val graded = Storage.cboStarJoin(spark, sfDir)
      .orderBy("c_mktsegment").collect().toSeq
    val plain = Storage.cboStarJoinPlan(spark, sfDir)
      .orderBy("c_mktsegment").collect().toSeq
    assert(graded.nonEmpty && graded == plain,
      "join reorder must be semantics-free")
  }
}
