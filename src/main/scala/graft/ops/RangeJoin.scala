package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — all (left, right) pairs of the same key with the right
  * event inside a trailing time window of the left event
  * (`r.ts ∈ [l.ts - T, l.ts]`). Where [[AsOfJoin]] keeps only the latest
  * match, this keeps every match (e.g. all clicks contributing to a
  * purchase within the attribution window).
  *
  * Scale shape: the direct inequality join can only plan as a broadcast
  * nested loop — O(|L|·|R|) per key. Instead, both sides are bucketed by
  * `floor(ts / T)`: a right row can only match left rows in its own or the
  * next bucket, so exploding the right side into those two bucket keys
  * turns the range join into an ordinary hash equi-join on (key, bucket)
  * plus a cheap residual filter. Each qualifying pair appears exactly once.
  */
object RangeJoin {

  /** All `rightType` events within `windowSec` before each `leftType`
    * event of the same user. Output: (left_id, right_id, gap_s). */
  def trailingWindowPairs(events: DataFrame, leftType: String,
                          rightType: String, windowSec: Long): DataFrame =
    pairsWithTs(events, leftType, rightType, windowSec)
      .select("left_id", "right_id", "user_id", "gap_s")

  /** The bucketed pair join, right timestamp retained for consumers that
    * aggregate on the touch side (attribution). */
  private def pairsWithTs(events: DataFrame, leftType: String,
                          rightType: String, windowSec: Long): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("left_id"),
        col("ts").as("l_ts"),
        floor(unix_timestamp(col("ts")) / windowSec).as("bucket"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("event_id").as("right_id"),
        col("ts").as("r_ts"),
        explode(array(
          floor(unix_timestamp(col("ts")) / windowSec),
          floor(unix_timestamp(col("ts")) / windowSec) + 1)).as("bucket"))
    l.join(r, Seq("user_id", "bucket"))
      .withColumn("gap_s",
        unix_timestamp(col("l_ts")) - unix_timestamp(col("r_ts")))
      .filter(col("gap_s") >= 0 && col("gap_s") <= windowSec)
  }

  /** Linear multi-touch attribution: every `touchType` event within
    * `windowSec` before a `convType` conversion shares the conversion's
    * credit equally (the "linear" model; the as-of join J4 is its
    * last-touch special case). Credit is integer micro-units —
    * `1000000 div n_touches` per touch — so the rollup is exact integer
    * arithmetic on both engine and oracle; no float summation order can
    * diverge.
    *
    * Scale shape: the pair set comes from the bucketed equi-join above
    * (never a nested loop); the per-conversion touch count is one extra
    * hash aggregate keyed by conversion id (partial map-side), and the
    * final rollup groups by hour-of-day — a 24-row exchange. */
  def linearAttribution(events: DataFrame, convType: String,
                        touchType: String, windowSec: Long): DataFrame = {
    val pairs = pairsWithTs(events, convType, touchType, windowSec)
    val n = pairs.groupBy("left_id").agg(count(lit(1)).as("n_touches"))
    pairs.join(n, "left_id")
      .withColumn("credit_micro", expr("1000000 div n_touches"))
      .groupBy(hour(col("r_ts")).as("touch_hour"))
      .agg(sum("credit_micro").as("credit_micro"),
           count(lit(1)).as("n_touches_total"))
  }
}
