package graft

import org.apache.spark.sql.functions._

/** The DataSource V2 connector (`s7b_pushdown_source`): filter pushdown
  * must narrow the GENERATED interval (pruned rows never exist), column
  * pruning must reach the leaf, and the output must be bit-identical to
  * the DataFrame generator it wraps. */
class GenSourceSpec extends SparkSpec {

  private def source(rows: Long = 1000, parts: Int = 4) =
    spark.read.format(classOf[graft.sources.GenSource].getName)
      .option("rows", rows).option("partitions", parts).load()

  // memory-sink names must be fresh per run (see SparkSpec.freshSinkName)
  private def freshName(prefix: String): String = freshSinkName(prefix)

  test("full scan is bit-identical to Generator.voters") {
    val got = source().orderBy("voter_id").collect().toSeq
    val want = graft.gen.Generator.voters(spark, 1000)
      .orderBy("voter_id").collect().toSeq
    assert(got.size === 1000 && got === want)
  }

  test("id-range filters narrow the scan interval at the leaf") {
    val q = source()
      .filter(col("voter_id") >= 100 && col("voter_id") < 600)
      .select("voter_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("lo=100") && plan.contains("hi=600"),
      s"expected the pushed interval in the scan description:\n$plan")
    assert(q.count() === 500)
  }

  test("column pruning reaches the leaf; equality pins one row") {
    val q = source().filter(col("voter_id") === 42)
      .select("party_affiliation")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("lo=42") && plan.contains("hi=43"),
      s"equality must collapse the interval:\n$plan")
    // the equality filter is consumed by the interval, so voter_id is
    // not even read — the scan narrows to the one projected column
    assert(plan.contains("cols=party_affiliation)"),
      s"only the needed columns may reach the reader:\n$plan")
    assert(q.collect().map(_.getString(0)).toSeq ===
      Seq(graft.gen.Generator.Parties(42 % 3)))
  }

  test("residual filters still apply above the scan") {
    val got = source()
      .filter(col("voter_id") < 10 && col("gender") === "female")
      .select("voter_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("partition planning splits the narrowed interval, empty slices dropped") {
    val q = source(rows = 1000, parts = 8)
      .filter(col("voter_id") >= 998).select("voter_id")
    // 2 surviving ids over 8 requested partitions → non-empty slices only
    assert(q.rdd.getNumPartitions <= 2)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(998L, 999L))
  }

  test("slice boundaries near Long.MaxValue stay monotone and non-overlapping") {
    // the naive i*n/k boundary overflows Long here and inverts slices
    for ((lo, hi) <- Seq((0L, Long.MaxValue), (5L, Long.MaxValue),
                         (Long.MaxValue - 1000L, Long.MaxValue));
         k <- Seq(1, 3, 32, 1000)) {
      val slices = graft.sources.GenPartition.slice(lo, hi, k)
        .map(_.asInstanceOf[graft.sources.GenPartition])
      assert(slices.nonEmpty, s"($lo,$hi,$k) lost the interval")
      assert(slices.head.start === lo && slices.last.end === hi,
        s"($lo,$hi,$k) must cover the interval exactly")
      slices.foreach(p => assert(p.end > p.start,
        s"($lo,$hi,$k) produced inverted/empty slice $p"))
      slices.sliding(2).foreach {
        case Array(a, b) => assert(a.end === b.start,
          s"($lo,$hi,$k) slices must be contiguous: $a then $b")
        case _ => ()
      }
      // balanced: no slice may exceed ceil(n/k) (the naive formula's
      // overflow shows up here as one giant or negative-width slice)
      val n = hi - lo
      val ceil = n / k + (if (n % k == 0) 0 else 1)
      slices.foreach(p => assert(p.end - p.start <= ceil,
        s"($lo,$hi,$k) slice $p wider than ceil(n/k)=$ceil"))
    }
  }

  test("COUNT(*) is answered by arithmetic — no rows generated") {
    val q = source()
      .filter(col("voter_id") >= 100 && col("voter_id") < 600)
      .selectExpr("count(*) AS n_rows")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GenCountScan(lo=100, hi=600)"),
      s"expected the pushed-count scan:\n$plan")
    assert(q.collect().head.getLong(0) === 500L)
  }

  test("pushed COUNT over an empty interval is 0, not an empty result") {
    val q = source()
      .filter(col("voter_id") >= 600 && col("voter_id") < 600)
      .selectExpr("count(*) AS n_rows")
    assert(q.collect().head.getLong(0) === 0L)
  }

  test("streaming read: admission control paces genuine micro-batches") {
    val table = freshName("g_s7e_spec")
    val q = spark.readStream
      .format(classOf[graft.sources.GenSource].getName)
      .option("rows", 1000).option("partitions", 4).option("step", 256)
      .load()
      .groupBy("party_affiliation")
      .agg(count(lit(1)).as("n_voters"))
      .writeStream.format("memory").queryName(table)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // recentProgress publishes AFTER commit visibility — poll briefly
      // so the final batch's progress entry has landed (the same
      // discipline Spark's own suites use around recentProgress)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def dataProgress() = q.recentProgress.filter(_.numInputRows > 0)
      while (System.nanoTime() < deadline &&
             (dataProgress().length < 4 ||
              dataProgress().last.sources.head.endOffset != "1000"))
        Thread.sleep(50)
      val dataBatches = dataProgress().length
      assert(dataBatches === 4,
        s"1000 ids at 256/trigger must span 4 batches, got $dataBatches: " +
          q.recentProgress.map(_.numInputRows).mkString(","))
      val end = dataProgress().last.sources.head.endOffset
      assert(end == "1000", s"final committed offset must be 1000, got $end")
    } finally q.stop()
    val got = spark.table(table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = graft.gen.Generator.voters(spark, 1000)
      .groupBy("party_affiliation").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want, "streamed tally must equal the batch generator's")
  }

  test("Trigger.AvailableNow drains to the full extent, never a partial commit") {
    val table = freshName("g_s7e_avnow")
    val q = spark.readStream
      .format(classOf[graft.sources.GenSource].getName)
      .option("rows", 1000).option("partitions", 4).option("step", 256)
      .load()
      .groupBy("party_affiliation")
      .agg(count(lit(1)).as("n_voters"))
      .writeStream.format("memory").queryName(table)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val total = spark.table(table)
      .agg(org.apache.spark.sql.functions.sum("n_voters")).head().getLong(0)
    assert(total === 1000L,
      s"AvailableNow must process ALL 1000 rows before terminating, got $total")
  }
}
