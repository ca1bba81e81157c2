package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sort / top-k operators (SURVEY.md §2.5).
  *
  * W1/W2 realize the reference's leaderboard-and-winner semantics
  * (`.../Note_Projet1_RealTimeVotingDataEngineer.txt:16-19,37`).
  */
object Windows {

  /** W1: rank leaderboard. The rank window here runs over the *aggregated*
    * frame (one row per candidate), so the unpartitioned `Window.orderBy`
    * single-partition step only ever sees key-cardinality rows — fine at any
    * input scale. Never rank the raw fact table unpartitioned. */
  def leaderboard(events: DataFrame): DataFrame = {
    val agg = events.groupBy("event_type").agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy(desc("n_events"), asc("event_type"))
    agg.withColumn("rnk", rank().over(w))
  }

  /** W2: top-k — Spark plans `orderBy(...).limit(k)` as
    * TakeOrderedAndProject: per-partition heap of k, then a driver merge of
    * k·numPartitions rows. No global sort, no full shuffle. Deterministic
    * tie-break for the oracle. */
  def topKByAggregate(events: DataFrame, k: Int): DataFrame =
    events.groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"))
      .orderBy(desc("total_value"), asc("user_id"))
      .limit(k)

  /** Decile assignment per group — the scoring-pipeline step that turns a
    * continuous quality/value signal into ranked buckets ("train on the
    * top three deciles per language"). `ntile` runs PARTITIONED by the
    * group column, so each group sorts independently — the unpartitioned
    * form would funnel the whole table through one task. The total order
    * inside a group is made deterministic with the unique-id tie-break,
    * which is what lets an oracle replay tile boundaries exactly. */
  def ntileDeciles(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(desc("value"), asc("event_id"))
    events
      .withColumn("decile", ntile(10).over(w))
      .groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"),
        round(min("value"), 2).as("min_value"),
        round(max("value"), 2).as("max_value"))
      .orderBy("event_type", "decile")
  }

  /** Running/cumulative total per key — the [X] trend-line window from
    * SURVEY §2.5 ("évolution des candidats au fur et à mesure des votes",
    * `.../txt:37`). Partitioned by key so it scales horizontally; ordered by
    * the unique event id so the frame is deterministic. */
  def runningTotalPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("event_id"), col("user_id"),
      round(sum("value").over(w), 2).as("running_value"))
  }

  /** Relative-rank pair (percent_rank + cume_dist) over per-user spend —
    * the distribution-position seat of §2.5. Like [[leaderboard]], the
    * unpartitioned window runs over the AGGREGATED frame (one row per
    * user — key cardinality, never the fact table). The order includes
    * the unique key, so tied spends take distinct deterministic
    * positions and both engines assign identical fractions. */
  def relativeSpendRank(events: DataFrame): DataFrame = {
    val spend = events.groupBy("user_id")
      .agg(round(sum("value"), 2).as("spend"))
    val w = Window.orderBy(asc("spend"), asc("user_id"))
    spend.select(col("user_id"), col("spend"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
      .orderBy("user_id")
  }

  /** Trailing-interval moving average: a RANGE frame over epoch seconds —
    * value-based, so rows sharing a timestamp are peers and the frame is
    * deterministic REGARDLESS of tie order (a ROWS frame would need a
    * tie-break to be well-defined). The window partitions on user_id;
    * epoch seconds come from a truncating cast, identical across engines.
    */
  def movingAvgTrailing(events: DataFrame, seconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_s"))
      .rangeBetween(-seconds, 0)
    events
      .select(col("event_id"), col("user_id"), col("value"),
              col("ts").cast("long").as("ts_s"))
      .select(col("event_id"), col("user_id"),
              round(avg("value").over(w), 4).as("mov_avg"))
  }

  /** Group-wise top-k ("the 3 biggest spenders per event type") — the
    * window runs PARTITIONED by the group over the already-aggregated
    * (group, user) totals, so no group ever funnels the raw fact table
    * through one task: the aggregate is one map-side-combined exchange,
    * and each group sorts only its own key-cardinality slice. The
    * unique-id tie-break keeps the cut deterministic for the oracle. */
  def topKPerGroup(events: DataFrame, k: Int): DataFrame = {
    val totals = events.groupBy("event_type", "user_id")
      .agg(round(sum("value"), 2).as("total_value"))
    val w = Window.partitionBy("event_type")
      .orderBy(desc("total_value"), asc("user_id"))
    totals.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
