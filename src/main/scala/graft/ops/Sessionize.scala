package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.streaming.StreamOps.Ev

/** Sessionization — gap-based session counting per user, the canonical
  * custom-state operator a training-data/eventstream pipeline needs beyond
  * plain windowed aggs.
  *
  * Batch form uses `KeyValueGroupedDataset.flatMapGroups` with an in-group
  * sort (per-user event counts are bounded in practice); for pathological
  * keys [[sessionsPerUserSecondarySort]] runs the same transition function
  * after `repartition(key).sortWithinPartitions` — constant memory per
  * key. The streaming form with `mapGroupsWithState` lives in the
  * streaming spec — same transition function, state = last event time +
  * open-session count.
  */
object Sessionize {

  /** One session = maximal run of a user's events with inter-event gap
    * <= `gapSeconds`. Returns (user_id, n_sessions). */
  def sessionsPerUser(spark: SparkSession, events: DataFrame,
                      gapSeconds: Long = 1800L): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Ev] = events
      .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]
    ds.groupByKey(_.user_id)
      .flatMapGroups { (user, it) =>
        val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        var sessions = 0L
        var lastMs = Long.MinValue
        evs.foreach { e =>
          if (lastMs == Long.MinValue ||
              (e.ts.getTime / 1000 - lastMs / 1000) > gapSeconds) sessions += 1
          lastMs = e.ts.getTime
        }
        Iterator.single((user, sessions))
      }
      .toDF("user_id", "n_sessions")
  }

  /** The secondary-sort form of [[sessionsPerUser]] — identical result,
    * O(1) memory per key: hash-repartition on user, sort WITHIN each
    * partition on (user, ts, event_id) — Spark's shuffle+sort does the
    * ordering, no per-group buffering — then one streaming pass over the
    * partition iterator detecting user boundaries and session gaps. This
    * is the form to run when a single user can hold millions of events
    * (the pathological-key case `flatMapGroups`' in-memory `toArray`
    * cannot survive). */
  def sessionsPerUserSecondarySort(spark: SparkSession, events: DataFrame,
                                   gapSeconds: Long = 1800L,
                                   partitions: Int = 0): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val nPart = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    events
      .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]
      .repartition(nPart, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        // single forward pass; state = (current user, #sessions, last ts)
        new Iterator[(Long, Long)] {
          private var cur = Long.MinValue
          private var sessions = 0L
          private var lastMs = Long.MinValue
          private var pending: Option[(Long, Long)] = None
          private var done = false
          private def advance(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val e = it.next()
              if (e.user_id != cur) {
                if (cur != Long.MinValue) pending = Some((cur, sessions))
                cur = e.user_id; sessions = 1L; lastMs = e.ts.getTime
              } else {
                if (e.ts.getTime / 1000 - lastMs / 1000 > gapSeconds) sessions += 1
                lastMs = e.ts.getTime
              }
            }
            if (pending.isEmpty && !it.hasNext && !done && cur != Long.MinValue) {
              pending = Some((cur, sessions)); done = true
            }
          }
          override def hasNext: Boolean = { advance(); pending.nonEmpty }
          override def next(): (Long, Long) = {
            advance(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF("user_id", "n_sessions")
  }

  /** Gaps-and-islands: per-user activity streaks over calendar days.
    * A streak = maximal run of CONSECUTIVE active days; the island key is
    * the classic `day_ordinal - row_number()` difference, constant within
    * a run and strictly increasing across gaps. All-integer arithmetic,
    * so the oracle agrees bit-exactly.
    *
    * Scale shape: distinct (user, day) first — the only exchange over
    * data, carrying at most users × days rows; the window is partitioned
    * by user (no global sort), and both follow-up aggregates reuse the
    * same user-keyed partitioning. */
  def activityStreaks(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("island",
        datediff(col("d"), to_date(lit("2024-01-01"))) -
          row_number().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
           max("len").as("max_streak"),
           count(lit(1)).as("n_streaks"))
  }
}
