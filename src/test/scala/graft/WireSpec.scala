package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.{StreamOps, Wire}
import graft.streaming.StreamOps.Ev

/** The Kafka-shaped source seam end to end, and the full
  * flatMapGroupsWithState session state machine with event-time timeout. */
class WireSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(t), user, typ, v)

  test("MemoryEventSource emits the Kafka wire schema and decodes through P1-P3") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val src = new Wire.MemoryEventSource(ms)
    val decoded = graft.ops.Decode.flatten(
      graft.ops.Decode.jsonDecodeDdl(
        graft.ops.Decode.castValueToString(src.load(spark)),
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"))
    val q = new Wire.MemoryEventSink("wire_rt").write(decoded).start()
    try {
      ms.addData(ev(1, "2024-01-01 00:00:00", 7, "click", 2.5),
                 ev(2, "2024-01-01 00:00:01", 8, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wire_rt")
        .select("event_id", "user_id", "event_type", "value")
        .as[(Long, Long, String, Double)].collect().toSet
      assert(rows === Set((1L, 7L, "click", 2.5), (2L, 8L, "view", 1.0)))
    } finally q.stop()
  }

  test("streaming as-of via mapGroupsWithState: purchases match the latest prior click") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    // state = latest click (ts, id) per user; purchases emit (purchase_id, click_id)
    val matched = ms.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), (Long, Option[Long])](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Long, evs: Iterator[Ev], state: GroupState[(Long, Long)]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[(Long, Option[Long])]()
          sorted.foreach { e =>
            if (e.event_type == "click") state.update((e.ts.getTime, e.event_id))
            else if (e.event_type == "purchase") {
              val m = state.getOption.collect {
                case (cts, cid) if e.ts.getTime - cts <= 3600 * 1000 => cid
              }
              out += ((e.event_id, m))
            }
          }
          out.iterator
      }
    val table = freshSinkName("asof_stream")
    val q = matched.toDF("purchase_id", "click_id")
      .writeStream.format("memory").queryName(table)
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 0.0))
      q.processAllAvailable()
      // cross-batch: purchase in a later batch uses state from the earlier one
      ms.addData(ev(2, "2024-01-01 10:30:00", 1, "purchase", 9.0),
                 ev(3, "2024-01-01 09:00:00", 2, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table(table)
        .as[(Long, Option[Long])].collect().toMap
      assert(out(2L) === Some(1L))
      assert(out(3L) === None)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases match clicks within the time bound") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF()
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases.toDF()
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
    val table = freshSinkName("ss_join")
    val q = joined.select("purchase_id", "click_id")
      .writeStream.format("memory").queryName(table).outputMode("append").start()
    try {
      clicks.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
                     ev(2, "2024-01-01 06:00:00", 2, "click", 0.0))
      purchases.addData(ev(10, "2024-01-01 10:30:00", 1, "purchase", 9.0),
                        ev(11, "2024-01-01 10:30:00", 2, "purchase", 9.0))
      q.processAllAvailable()
      val out = spark.table(table).as[(Long, Long)].collect().toSet
      assert(out === Set((10L, 1L))) // user-2's click is 4.5h old -> no match
    } finally q.stop()
  }

  test("flatMapGroupsWithState: sessions close on event-time timeout") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    // state: (sessionStartMs, lastSeenMs, nEvents); emit on timeout
    val sessions = ms.toDS()
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (_, _, n) = state.get
            state.remove()
            Iterator.single((user, n))
          } else {
            val times = evs.map(_.ts.getTime).toSeq
            val (s0, _, n0) = state.getOption.getOrElse((times.min, times.min, 0L))
            state.update((s0, times.max, n0 + times.size))
            // session closes 30 min after the last event
            state.setTimeoutTimestamp(times.max + 30 * 60 * 1000)
            Iterator.empty
          }
      }
    val table = freshSinkName("fmgws")
    val q = sessions.toDF("user_id", "n_events")
      .writeStream.format("memory").queryName(table).outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
                 ev(2, "2024-01-01 00:10:00", 1, "a", 1.0))
      q.processAllAvailable()
      assert(spark.table(table).isEmpty) // session still open
      // event far in the future advances the watermark past the timeout
      ms.addData(ev(3, "2024-01-01 03:00:00", 2, "a", 1.0))
      q.processAllAvailable()
      // one more batch so the timed-out state is flushed
      ms.addData(ev(4, "2024-01-01 03:01:00", 2, "a", 1.0))
      q.processAllAvailable()
      val out = spark.table(table).as[(Long, Long)].collect().toSet
      assert(out.contains((1L, 2L)), s"user-1 session (2 events) should have closed: $out")
    } finally q.stop()
  }

  test("streaming funnel: stage state advances across micro-batches, never regresses") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val staged = ms.toDS().groupByKey(_.user_id)
      .mapGroupsWithState[(Int, Long), (Long, Int)](GroupStateTimeout.NoTimeout)(
        StreamOps.funnelStep(Seq("view", "click", "purchase")))
    val table = freshSinkName("funnel_stream")
    val q = staged.toDF("user_id", "stage")
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: user 1 views; user 2 clicks (click BEFORE any view)
      ms.addData(ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
                 ev(2, "2024-01-01 10:00:00", 2, "click", 0.0))
      q.processAllAvailable()
      // batch 2: user 1 click+purchase completes via batch-1 state;
      // user 2's view starts a funnel its earlier click must NOT satisfy
      ms.addData(ev(3, "2024-01-01 10:05:00", 1, "click", 0.0),
                 ev(4, "2024-01-01 10:10:00", 1, "purchase", 5.0),
                 ev(5, "2024-01-01 10:05:00", 2, "view", 0.0))
      q.processAllAvailable()
      val last = spark.table(table).as[(Long, Int)].collect()
        .groupBy(_._1).map { case (u, rows) => (u, rows.map(_._2).max) }
      assert(last(1L) == 3, s"user 1 completed the funnel cross-batch: $last")
      assert(last(2L) == 1, s"user 2's pre-view click must not count: $last")
    } finally q.stop()
  }
}
