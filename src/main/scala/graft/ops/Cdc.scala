package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: dimension-history assembly (SCD Type 2)
  * and MERGE-style upsert — the two ops that turn an append-only change
  * log into a queryable dimension at warehouse scale. The reference's
  * pipeline treats its vote stream as exactly such a log (one row per
  * state change, latest-wins compaction in `voting.py:120-126`); these
  * give the log the standard dimension treatments instead of only the
  * latest-wins one ([[Dedup.firstPerKey]] covers that).
  *
  * Scale shape: both ops are ONE shuffle on the business key. SCD2 is a
  * per-key window (lead); merge is a full outer join where the change
  * side has already been compacted to one row per key — at 100 TB the
  * compacted change batch is usually small enough to broadcast, and when
  * it isn't, both sides hash-partition on the key once.
  */
object Cdc {

  /** SCD Type 2 history assembly: each change row becomes a versioned
    * interval `[valid_from, valid_to)` per key, `valid_to` = the next
    * change's timestamp (open-ended for the current version). Ordering is
    * (ts, event_id) so same-timestamp changes version deterministically.
    * Timestamps are emitted as epoch MICROS (long) — integer-exact across
    * engines, no format/round divergence. */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
              col("event_type"))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", unix_micros(lead("ts", 1).over(w)))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select("user_id", "event_id", "event_type",
              "valid_from_us", "valid_to_us", "is_current")
  }

  /** Point-in-time correct enrichment — the feature-store primitive: each
    * fact row joins the dimension VERSION that was valid at the fact's
    * event time (never a later one — the leakage a naive latest-value
    * join introduces into training data). The dimension is the SCD2
    * interval table assembled from the key's change stream
    * ([[scd2History]] shape); the join is an equi-join on the key with
    * the interval containment as a residual filter — hash-partitioned
    * once on the key, never an interval explosion, because a key's
    * versions partition time (exactly one interval covers each fact). */
  def pitEnrich(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val dim = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("tier", pmod(col("event_id"), lit(5)))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", unix_micros(lead("ts", 1).over(w)))
      .select("user_id", "tier", "valid_from_us", "valid_to_us")
    events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .join(dim, Seq("user_id"))
      .filter(col("ts_us") >= col("valid_from_us") &&
        (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")))
      .select("purchase_id", "user_id", "tier")
  }

  /** MERGE-style upsert: apply a change batch onto a base dimension as a
    * FULL OUTER join — the scalable MERGE plan (matched → update,
    * change-only → insert, base-only → keep). The change batch must
    * arrive pre-compacted to one row per key ([[Dedup]] / latest-wins);
    * this op is pure set logic on top. */
  def mergeUpsert(base: DataFrame, changes: DataFrame,
                  baseKey: String, changeKey: String,
                  baseVal: String, changeVal: String): DataFrame =
    base.join(changes, col(baseKey) === col(changeKey), "full_outer")
      .select(
        coalesce(col(baseKey), col(changeKey)).as("key"),
        when(col(baseKey).isNull, lit("insert"))
          .when(col(changeKey).isNull, lit("keep"))
          .otherwise(lit("update")).as("action"),
        coalesce(col(changeVal), col(baseVal)).as("value"))

  /** [[mergeUpsert]] completed with DELETE tombstones — the full CDC
    * MERGE action set (Debezium-style `op` column: 'upsert' | 'delete',
    * change batch pre-compacted to latest-wins per key). Action classes:
    *   update      — key in both, op = upsert
    *   insert      — change-only upsert
    *   keep        — base-only key, untouched
    *   delete      — key in both, op = delete (value nulled; consumers
    *                 drop these rows to materialize the post-merge dim)
    *   noop_delete — tombstone for a key the dim never had (MERGE's
    *                 WHEN NOT MATCHED AND op = delete: no-op, surfaced
    *                 rather than silently swallowed so conservation is
    *                 auditable)
    * Same one full-outer join as the upsert form — tombstones add a
    * predicate, not a pass. */
  def mergeApplyTombstones(base: DataFrame, changes: DataFrame,
                           baseKey: String, changeKey: String,
                           baseVal: String, changeVal: String,
                           opCol: String): DataFrame =
    base.join(changes, col(baseKey) === col(changeKey), "full_outer")
      .select(
        coalesce(col(baseKey), col(changeKey)).as("key"),
        when(col(changeKey).isNull, lit("keep"))
          .when(col(opCol) === "delete" && col(baseKey).isNull,
            lit("noop_delete"))
          .when(col(opCol) === "delete", lit("delete"))
          .when(col(baseKey).isNull, lit("insert"))
          .otherwise(lit("update")).as("action"),
        when(col(opCol) === "delete", lit(null).cast("double"))
          .otherwise(coalesce(col(changeVal), col(baseVal))).as("value"))

  /** Snapshot differencing: classify every key across two table
    * snapshots as added / removed / changed (unchanged keys are
    * dropped — at 100 TB the diff is the small output, the snapshots
    * are the big inputs). The engine compares ONE 64-bit `xxhash64`
    * digest of the value columns per side instead of N column
    * comparisons, so the wide-row compare stays a single cheap long
    * equality inside codegen; the join is a full outer hash-partitioned
    * once on the key. A false "changed" needs a 64-bit digest collision
    * ON THE SAME KEY (p ≈ 2⁻⁶⁴ per key) — acceptable for a diff report,
    * and the row-level output means any hit is auditable. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String, valueCols: Seq[String]): DataFrame = {
    def digested(df: DataFrame, side: String) =
      df.select(col(key).as(s"${side}_key"),
                xxhash64(valueCols.map(col): _*).as(s"${side}_digest"))
    digested(oldSnap, "old")
      .join(digested(newSnap, "new"),
            col("old_key") === col("new_key"), "full_outer")
      .select(
        coalesce(col("old_key"), col("new_key")).as(key),
        when(col("old_key").isNull, lit("added"))
          .when(col("new_key").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** The events table re-read as an append-only CDC op log: every row is
    * an operation on its `user_id` key — `delete` tombstones for error
    * events, `upsert`s carrying the value otherwise — stamped with a
    * deterministic batch id (commit epoch). Log order within a key is
    * (batch_id, ts, event_id): the commit sequence first, arrival order
    * within a commit second — the ordering a lakehouse transaction log
    * actually defines. */
  def opLogFromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      pmod(col("event_id"), lit(8)).cast("int").as("batch_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("event_id"),
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("upsert")).as("op"),
      col("value"))

  /** Time travel: reconstruct the table state AS OF commit `asOfBatch`
    * from the op log — the lakehouse read every Delta/Iceberg user
    * expects (`VERSION AS OF B`). One hash shuffle on the key: filter
    * the log to `batch_id <= B` (at 100 TB this prunes whole commit
    * partitions before anything moves), take the per-key LAST op in
    * commit order, drop keys whose last op is a tombstone. Emits the
    * surviving (key, value) state. Contrast [[mergeUpsert]] (apply ONE
    * change batch forward) and [[snapshotDiff]] (compare two states):
    * this replays the log to an arbitrary historical point. */
  def timeTravelAsOf(log: DataFrame, asOfBatch: Int): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("batch_id").desc, col("ts_us").desc, col("event_id").desc)
    log.filter(col("batch_id") <= asOfBatch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select(col("user_id"), round(col("value"), 2).as("value"))
  }
}
