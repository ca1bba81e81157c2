package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * The reference's headline semantic: "a Spark job listens to incoming
  * events, consumes them, aggregates them, and re-emits"
  * (`/root/reference/Note_Projet1_RealTimeVotingDataEngineer.txt:34-35`);
  * the vote is an integer weight defaulting to 1
  * (`/root/reference/main.py:58`, `voting.py:102`).
  *
  * Scale notes: every groupBy here compiles to partial (map-side) hash
  * aggregation → exchange on the group key → final hash aggregation, so the
  * shuffle carries only one row per (partition, key) — cardinality of the
  * group domain, not of the data. With 5 event types or 25 nations the
  * exchange is a few KB regardless of input size; these plans survive 100 TB
  * unchanged.
  */
object Aggregates {

  /** A1: votes-per-candidate running sum/count
    * (`.../Note_Projet1_...txt:34-37`; weight field `main.py:58`,
    * schema slot `spark-streaming.py:61`). */
  def votesPerCandidate(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(round(sum("value"), 2).as("total_value"),
           count(lit(1)).as("n_events"))

  /** A2: turnout by location — the nested address struct is carried through
    * the vote schema solely for this analytics dimension
    * (`/root/reference/spark-streaming.py:49-55`). Post-agg join back to the
    * dim name is J3 (`.../txt:36-37`). */
  def turnoutByLocation(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.groupBy("c_nationkey")
      .agg(count(lit(1)).as("turnout"))
      .join(broadcast(nation),
            customer("c_nationkey") === nation("n_nationkey"))
      .select(col("n_name").as("location"), col("turnout"))

  /** A4: count / cardinality check (`/root/reference/main.py:175-179`,
    * `voting.py:66-69`). */
  def countRows(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n"))

  /** A5: winner / top-1 — "le candidat qui obtient le plus de vote gagne"
    * (`.../Note_Projet1_...txt:19`). Deterministic tie-break on the key so
    * the DuckDB oracle agrees. Spark plans this as TakeOrderedAndProject:
    * per-partition top-1 then a driver-side merge of k·numPartitions rows —
    * no global sort, safe at any scale. */
  def winner(events: DataFrame): DataFrame =
    votesPerCandidate(events)
      .orderBy(desc("n_events"), asc("event_type"))
      .limit(1)

  /** A6 exact: distinct cardinality, oracle-checkable. */
  def distinctUsers(events: DataFrame): DataFrame =
    events.agg(countDistinct("user_id").as("n_users"))

  /** A6 approx: HyperLogLog++ `approx_count_distinct` — the 100 TB path:
    * one pass, fixed-size sketch per partition, no shuffle of raw keys
    * (the exact variant shuffles every distinct key). Emitted next to the
    * exact count plus a bounded-error verdict (bound deliberately loose,
    * 5× the configured rsd), which makes the sketch DIFFERENTIALLY
    * testable: the oracle recomputes `n_users` exactly and expects
    * `approx_within_5pct` = true — if the sketch ever drifts past the
    * bound, the hash comparison goes red. */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events.agg(
        count_distinct(col("user_id")).as("n_users"),
        approx_count_distinct("user_id", 0.01).as("approx"))
      .select(col("n_users"),
        (abs(col("approx") - col("n_users")) <=
          col("n_users") * lit(0.05)).as("approx_within_5pct"))

  /** A1 skew-resistant variant: two-phase salted aggregation. Phase 1
    * groups on (key, salt) so a hot key's rows spread over `buckets`
    * reducers; phase 2 merges the partials on the key alone. Result is
    * identical to [[votesPerCandidate]] — this is the standard mitigation
    * when one candidate/key dominates the stream (the 100 TB skew case;
    * AQE's runtime skew-join split covers joins, salting covers
    * aggregation). Salt derives from a uniform-ish existing column, never
    * `rand()` (replays must be deterministic). */
  def votesPerCandidateSalted(events: DataFrame, buckets: Int = 16): DataFrame =
    events
      .groupBy(col("event_type"), pmod(col("event_id"), lit(buckets)).as("__salt"))
      .agg(sum("value").as("__pv"), count(lit(1)).as("__pc"))
      .groupBy("event_type")
      .agg(round(sum("__pv"), 2).as("total_value"), sum("__pc").as("n_events"))

  /** P6: empty-relation guard (`/root/reference/main.py:179-194`,
    * `voting.py:69-72`) — expressed as a declarative count over the guard
    * predicate rather than a driver-side `len()`. */
  def emptyGuardCount(events: DataFrame): DataFrame =
    events.filter(col("event_type") === lit("__nonexistent__"))
      .agg(count(lit(1)).as("n_matching"))

  /** Approximate heavy hitters, graded differentially like the A6/A7
    * sketches: exact counts of every key with share ≥ 1/`denom` (integer
    * arithmetic `n * denom >= total` — no float threshold to diverge at a
    * boundary), plus a verdict that `freqItems` (one pass, bounded
    * per-partition maps — the 100 TB path; the exact side costs a full
    * groupBy) surfaced each of them. The Karp–Papadimitriou–Shenker
    * sketch guarantees NO FALSE NEGATIVES at its support level regardless
    * of partitioning/order, so the boolean is replay-stable; its false
    * POSITIVES vary and are deliberately not graded. The fixture keyspace
    * is uniform, so the hot keys are injected deterministically (7 at
    * ~40%, 13 at ~20%) — the established inject-then-detect pattern. */
  def heavyHittersApprox(events: DataFrame, denom: Int = 20): DataFrame = {
    val keyed = events.select(
      when(col("user_id") % 5 < 2, lit(7L))
        .when(col("user_id") % 5 === 2, lit(13L))
        .otherwise(col("user_id") % 1000).as("hot_key"))
    val totals = keyed.agg(count(lit(1)).as("total"))
    val sketch = keyed.stat.freqItems(Seq("hot_key"), 1.0 / denom)
      .select(col("hot_key_freqItems").as("sketch_keys"))
    keyed.groupBy("hot_key").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(totals))
      .filter(col("n") * denom >= col("total"))
      .crossJoin(broadcast(sketch))
      .select(col("hot_key"), col("n"),
              array_contains(col("sketch_keys"), col("hot_key"))
                .as("found_by_sketch"))
      .orderBy("hot_key")
  }

  /** Incremental aggregate maintenance (materialized-view refresh): the
    * running per-key totals are kept as PARTIAL aggregates per ingest
    * batch and MERGED by re-aggregation — count/sum add, min/max fold —
    * so a refresh touches one batch plus the compact state, never the
    * raw history. At 100 TB this is the difference between an hourly
    * refresh reading an hour and reading a year. Sums are integer CENTS:
    * associative, so the two-level fold is bit-equal to the oracle's
    * one-level sum by arithmetic, not by luck (a double sum would differ
    * in fold order). The batch split here is a deterministic hash of the
    * row id — the stand-in for arrival day. */
  def incrementalMerge(events: DataFrame): DataFrame = {
    val partials = events
      .withColumn("batch", pmod(col("event_id"), lit(2)))
      .groupBy("batch", "user_id")
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("cents"),
           min("value").as("mn"), max("value").as("mx"))
    partials.groupBy("user_id")
      .agg(sum("n").as("n_events"),
           sum("cents").as("total_cents"),
           min("mn").as("min_value"), max("mx").as("max_value"))
      .orderBy("user_id")
  }

  /** Winsorized robust statistics: per-group exact p05/p95 bounds, then
    * every value CLIPPED into [p05, p95] before the mean — the standard
    * outlier-taming preprocessing step (feature scaling, reward
    * normalization) where a single corrupt reading would otherwise move
    * the group mean arbitrarily far.
    *
    * Two scan-parallel passes, no window: pass 1 folds each group to a
    * 1-row bounds record (exact `percentile` — sort-based within the
    * aggregation, never a global sort); the |groups|-row bounds table
    * BROADCASTS back onto the fact scan for the clip + final fold. A
    * `percentile_cont OVER (PARTITION BY group)` window would funnel
    * every group's rows through one task — at 100 TB with few groups
    * that is THE straggler shape, while this form's second pass is an
    * ordinary map-side-combinable aggregate. Clip counts ride along so
    * the oracle also grades how many rows each bound touched; the
    * winsorized mean is summed in integer micro-units of the CLIPPED
    * value (bounds are exact doubles, micros rounding is deterministic)
    * to keep the cross-engine compare order-insensitive. */
  def winsorizedStats(events: DataFrame): DataFrame = {
    val bounds = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.05)").as("p05"),
           expr("percentile(value, 0.95)").as("p95"))
    val clipped = events.select(col("event_type"), col("value"))
      .join(broadcast(bounds), Seq("event_type"))
      .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
    clipped.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(when(col("value") < col("p05"), 1L).otherwise(0L))
             .as("n_clip_low"),
           sum(when(col("value") > col("p95"), 1L).otherwise(0L))
             .as("n_clip_high"),
           round(first(col("p05")), 4).as("p05_r"),
           round(first(col("p95")), 4).as("p95_r"),
           sum(round(col("w") * 1000000).cast("long")).as("win_micros"))
      .orderBy("event_type")
  }
}
