package graft

import graft.streaming.StreamOps

/** Spark 4's state data source — the `t27` seat: the keyed state read
  * back out of a stopped query's checkpoint must be exactly the
  * semantic state (the dedup key set), proving checkpoints are
  * auditable data, not opaque blobs. */
class StateSourceSpec extends SparkSpec {
  import spark.implicits._

  test("statestore readback equals the batch distinct-user set") {
    val fromState = StreamOps
      .stateSourceDedupAudit(spark, sfDir, statePartitions = Some(4))
      .as[Long].collect().toSet
    val want = Tables.events(spark, sfDir)
      .select("user_id").distinct().as[Long].collect().toSet
    assert(fromState.nonEmpty && fromState === want)
  }
}
