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

  test("t30 TWS timers close the exact sessions the legacy timeout " +
       "API closes (migration parity)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val tws = rows(StreamOps.twsTimerSessions(spark, sfDir,
      statePartitions = Some(4)))
    val legacy = rows(StreamOps.streamingTimeoutSessions(spark, sfDir,
      statePartitions = Some(4)))
    assert(tws.nonEmpty && tws === legacy)
  }

  test("t30 emits both close paths: in-batch gap closes AND " +
       "watermark-fired timer closes") {
    val gapUs = 1800L * 1000000L
    val closed = StreamOps.twsTimerSessions(spark, sfDir,
        statePartitions = Some(4))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // in-batch closes: sessions followed by another session of the same
    // user (the gap between them exceeded gapUs inside the batch)
    val byUser = closed.groupBy(_._1)
    assert(byUser.exists(_._2.length >= 2),
      "fixture must close at least one session in-batch (gap path)")
    // timer closes: each user's LAST closed session has no successor —
    // it can only have been emitted by the expired-timer callback
    val maxUs = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val timerClosed = byUser.values.map(_.maxBy(_._2)).filter { s =>
      Math.floorDiv(s._3 + gapUs, 1000L) < Math.floorDiv(maxUs, 1000L)
    }
    assert(timerClosed.nonEmpty,
      "fixture must close at least one tail session via the timer path")
  }

  test("t31 AvailableNow terminates itself and lands the full tally") {
    val got = StreamOps.availableNowTally(spark, sfDir,
        statePartitions = Some(4))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }
}
