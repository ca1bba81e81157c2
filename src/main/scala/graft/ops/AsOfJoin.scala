package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left event, the most recent right event of the
  * same key at-or-before it, within a tolerance. The canonical
  * training-pipeline instance is attribution: each purchase joined to the
  * latest prior click of the same user.
  *
  * Scale shape: the naive formulation is an inequality join
  * (`l.ts >= r.ts AND l.ts - r.ts <= tol`), which Spark can only plan as a
  * broadcast-nested-loop / cartesian range join — quadratic blow-up per
  * key. This implementation instead UNIONs both sides tagged, sorts once
  * per key (single hash-partition shuffle on the key), and carries the
  * latest right row forward with `last(..., ignoreNulls)` over a running
  * window — O(n log n) per key, one exchange total, whole-stage codegen'd.
  * The same pattern incrementalizes in streaming as a keyed state machine
  * ([[graft.streaming]] `mapGroupsWithState`).
  */
object AsOfJoin {

  /** Attribution over an events table: for every `leftType` event, the
    * latest `rightType` event of the same user at-or-before it within
    * `toleranceSec`. Output keeps unmatched left rows with a null match
    * (left-asof semantics). Ties on timestamp resolve to the larger right
    * event_id (deterministic). */
  def attribution(events: DataFrame, leftType: String, rightType: String,
                  toleranceSec: Long): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("tag"),
        lit(null).cast("long").as("r_id"), lit(null).cast("timestamp").as("r_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("tag"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))

    // right rows sort before left rows at equal ts (tag 0 < 1): "at or
    // before" includes same-instant matches; event_id breaks right-side ties
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("last_r_id", last("r_id", ignoreNulls = true).over(w))
      .withColumn("last_r_ts", last("r_ts", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("in_window",
        col("last_r_ts").isNotNull &&
        (unix_timestamp(col("ts")) - unix_timestamp(col("last_r_ts")) <= toleranceSec))
      .select(
        col("event_id").as("left_id"),
        col("user_id"),
        when(col("in_window"), col("last_r_id")).as("matched_right_id"),
        when(col("in_window"),
             unix_timestamp(col("ts")) - unix_timestamp(col("last_r_ts")))
          .as("gap_s"))
  }

  /** Forward as-of: for every `leftType` event, the EARLIEST `rightType`
    * event of the same user at-or-after it within `toleranceSec` — the
    * mirror of [[attribution]] (conversion-after-exposure instead of
    * exposure-before-conversion). Same union + keyed-window plan, scanned
    * in descending event time; at equal ts the right row still counts
    * (inclusive), ties resolve to the larger right event_id seen last in
    * the descending scan — deterministic, mirrored in the SQL oracle. */
  def attributionForward(events: DataFrame, leftType: String,
                         rightType: String, toleranceSec: Long): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("tag"),
        lit(null).cast("long").as("r_id"), lit(null).cast("timestamp").as("r_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("tag"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("next_r_id", last("r_id", ignoreNulls = true).over(w))
      .withColumn("next_r_ts", last("r_ts", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("in_window",
        col("next_r_ts").isNotNull &&
        (unix_timestamp(col("next_r_ts")) - unix_timestamp(col("ts")) <= toleranceSec))
      .select(
        col("event_id").as("left_id"),
        col("user_id"),
        when(col("in_window"), col("next_r_id")).as("matched_right_id"),
        when(col("in_window"),
             unix_timestamp(col("next_r_ts")) - unix_timestamp(col("ts")))
          .as("gap_s"))
  }
}
