package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.streaming.StreamOps.Ev

/** Sessionization — gap-based session counting per user, the canonical
  * custom-state operator a training-data/eventstream pipeline needs beyond
  * plain windowed aggs.
  *
  * Batch form uses `KeyValueGroupedDataset.flatMapGroups` with an in-group
  * sort (per-user event counts are bounded in practice; for pathological
  * keys the same logic runs after `repartition(key).sortWithinPartitions`
  * as a secondary sort). The streaming form with `mapGroupsWithState`
  * lives in the streaming spec — same transition function, state = last
  * event time + open-session count.
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
}
