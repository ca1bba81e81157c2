package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.EventAnalytics

/** Event-analytics operators: crafted-ordering semantics for the funnel
  * (strictly-after is what distinguishes it from a per-type count) and
  * conservation invariants for retention / gap-fill computed
  * independently of the implementation.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("funnel: stage order is strict — click before view doesn't count") {
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"), // click precedes view
      (3L, ts(1), "view"), (3L, ts(2), "purchase") // skips click
    ).toDF("user_id", "ts", "event_type")
    val row = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (3L, 1L, 1L))
  }

  test("funnel on the fixture: monotone non-increasing stages") {
    val row = SparkEntry.queries("funnel_stages")(spark, sfDir).collect()(0)
    val (v, c, p) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v, $c, $p")
    assert(p > 0, "vacuous: nobody completes the funnel")
  }

  test("retention: offset-0 diagonal partitions the user base") {
    val df = SparkEntry.queries("retention_cohorts")(spark, sfDir)
    val diag = df.filter(col("week_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = Tables.events(spark, sfDir)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(diag == users,
      s"every user is active in their own first week: $diag != $users")
    assert(df.filter(col("week_offset") < 0).isEmpty,
      "no activity before a user's first week")
  }

  test("gap-fill: dense spine, conserved totals, real zeros") {
    val df = SparkEntry.queries("ts_gapfill_hourly")(spark, sfDir).cache()
    try {
      val types = Tables.events(spark, sfDir)
        .select("event_type").distinct().count()
      val hours = df.select("hour").distinct().count()
      assert(df.count() == hours * types, "spine must be dense")
      val total = df.agg(sum("n")).collect()(0).getLong(0)
      val events = Tables.events(spark, sfDir).count()
      assert(total == events, s"counts conserved: $total != $events")
      assert(df.filter(col("n") === 0).count() > 0,
        "vacuous: no gaps were filled at this SF")
    } finally df.unpersist()
  }

  test("props extraction: group counts conserve the event count") {
    val df = SparkEntry.queries("props_json_extract")(spark, sfDir)
    val total = df.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    assert(df.filter(col("avg_k").isNull).isEmpty, "props must parse")
  }

  test("transition matrix: counts conserve and lift marginals are consistent") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val m = graft.ops.EventAnalytics.transitionMatrix(ev).cache()
    // every consecutive pair is one transition: N_events - N_active_users
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val total = m.agg(sum("n_trans")).head().getLong(0)
    assert(total === nEvents - nUsers)
    // from-marginals equal the per-type "has a successor" counts
    val fromMarg = m.groupBy("from_type").agg(sum("n_trans").as("n"))
      .as[(String, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val expect = ev.withColumn("nxt", lead("event_type", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(fromMarg === expect)
    // lift sanity: weighted by (n_from*n_to), lifts average to ~1
    val chk = m
      .withColumn("nf", sum("n_trans").over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_type")))
      .withColumn("nt", sum("n_trans").over(
        org.apache.spark.sql.expressions.Window.partitionBy("to_type")))
      .agg((sum(col("lift") * col("nf") * col("nt")) /
            (sum("n_trans") * lit(1.0) * total)).as("one"))
      .head().getDouble(0)
    assert(math.abs(chk - 1.0) < 0.01, s"lift mass should normalize, got $chk")
  }

  test("anomaly flags are two-sided: an outage dip flags like a spike") {
    // constant 10/hour, one dip hour (1) then one spike hour (50); the
    // dip's trailing frame is all-constant (variance 0, any deviation
    // flags), the spike deviates far beyond 3σ of its frame — both must
    // flag, and only they; warm-up hours (c < 2) must stay unjudged
    val rows = for {
      h <- 0 until 30
      n = if (h == 20) 1 else if (h == 25) 50 else 10
      i <- 0 until n
    } yield (new Timestamp(h * 3600000L + i * 1000L), "x")
    val ev = rows.toDF("ts", "event_type")
    val out = EventAnalytics.anomalyFlags(ev, sigmas = 3)
      .select("n", "is_anomaly").as[(Long, Boolean)].collect()
    val flagged = out.filter(_._2).map(_._1).sorted.toSeq
    assert(flagged === Seq(1L, 50L),
      s"exactly the dip and the spike must flag, got $flagged")
    // all 28 constant hours emit false — including hours 0/1, whose
    // trailing frames are too small to judge (c < 2)
    assert(out.count(r => !r._2 && r._1 == 10L) === 28,
      "constant hours (incl. the two warm-up hours) must not flag")
  }

  test("ohlcRollup rejects a fine width that straddles the coarse bar") {
    val ev = Seq((new Timestamp(0L), "x", 1.0, 1L))
      .toDF("ts", "event_type", "value", "event_id")
    intercept[IllegalArgumentException] { EventAnalytics.ohlcRollup(ev, 7) }
    intercept[IllegalArgumentException] { EventAnalytics.ohlcRollup(ev, 0) }
  }
}
