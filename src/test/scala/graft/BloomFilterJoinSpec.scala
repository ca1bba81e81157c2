package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the "bloom side-channel at scale"
  * the q18 plan notes point to. When a selective derived key set meets a
  * fact table in a SHUFFLE join (too big to broadcast at 100 TB), Spark's
  * InjectRuntimeFilter builds a Bloom filter over the creation side's join
  * keys and pushes `might_contain` onto the fact-side scan — rows that
  * cannot join die before the exchange instead of shuffling. The
  * production thresholds (10 GB application-side scan) are exactly what a
  * 100 TB fact table clears naturally; the spec scales them to the fixture
  * to pin the MECHANISM and its semantic neutrality. */
class BloomFilterJoinSpec extends SparkSpec {

  private val confs = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](m: Map[String, String])(body: => A): A = {
    val prev = m.keys.map(k => k -> spark.conf.getOption(k)).toMap
    m.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def bigOrdersJoin() = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice")
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    li.join(big, li("l_orderkey") === big("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(round(sum("l_extendedprice"), 2).as("rev"))
  }

  test("InjectRuntimeFilter pushes might_contain onto the fact side") {
    withConfs(confs) {
      val q = bigOrdersJoin()
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected a runtime bloom probe on the fact side:\n${opt.take(1500)}")
      assert(opt.contains("bloom_filter_agg"),
        s"expected a bloom build over the creation side keys:\n${opt.take(1500)}")
    }
  }

  test("bloom pruning is semantically neutral: same result with it off") {
    val withBloom = withConfs(confs) {
      bigOrdersJoin().orderBy("o_orderkey").collect().toSeq
    }
    val without = withConfs(confs.updated(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")) {
      val q = bigOrdersJoin()
      assert(!q.queryExecution.optimizedPlan.toString.contains("might_contain"))
      q.orderBy("o_orderkey").collect().toSeq
    }
    assert(withBloom.nonEmpty && withBloom == without)
  }
}
