package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Spark 4's `transformWithState` — the `t26` seat. The arbitrary-state
  * processor (ValueState cell per user, RocksDB backend) must reproduce
  * the batch GROUP BY exactly, and the update-mode emission must be
  * strictly monotone per key so the last-emit selection is sound. */
class TransformWithStateSpec extends SparkSpec {

  test("TWS running totals equal the batch group-by") {
    val got = StreamOps
      .transformWithStateTotals(spark, sfDir, statePartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Tables.events(spark, sfDir)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === want)
  }

  test("the RocksDB provider conf is scoped, not leaked") {
    StreamOps.transformWithStateTotals(spark, sfDir,
      statePartitions = Some(4)).count()
    assert(!spark.conf
      .get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"),
      "the provider override must not survive the query")
  }
}
