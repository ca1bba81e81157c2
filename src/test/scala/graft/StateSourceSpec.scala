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

  test("state-metadata names the operator and the committed batch range") {
    val (_, ckpt) = StreamOps
      .stateSourceDedupAuditWithCkpt(spark, sfDir, Some(4))
    val m = spark.read.format("state-metadata").load(ckpt).collect()
    assert(m.length === 1, s"one stateful operator expected: ${m.toSeq}")
    val row = m.head
    assert(row.getAs[String]("operatorName") === "dedupe")
    assert(row.getAs[Int]("numPartitions") === 4)
    // two paced files → batches 0 and 1 committed
    assert(row.getAs[Long]("minBatchId") === 0L)
    assert(row.getAs[Long]("maxBatchId") === 1L)
  }
}
