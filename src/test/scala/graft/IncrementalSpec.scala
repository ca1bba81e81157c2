package graft

import org.apache.spark.sql.functions._

/** Incremental-maintenance seats: the partial-merge identity behind
  * `incr_agg_merge` (two-level fold ≡ one-level, by integer
  * associativity, with a genuinely split input) and batch/stream parity
  * for the t14 decontamination feed.
  */
class IncrementalSpec extends SparkSpec {

  test("incremental merge equals the direct aggregate, with real batches") {
    val events = Tables.events(spark, sfDir)
    val merged = graft.ops.Aggregates.incrementalMerge(events)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val direct = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("c"),
           min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(merged == direct)
    // both hash-batches must be non-empty, or the merge never merged
    val batches = events.select(pmod(col("event_id"), lit(2)).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(batches.length == 2 && batches.forall(_ > 0),
      s"degenerate batch split: ${batches.toSeq}")
  }

  test("streaming decontamination feed matches the batch quarantine") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val batch = graft.ext.DedupOps.decontaminate(corpus, eval)
      .filter(col("contaminated"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val streamed = graft.streaming.StreamOps
      .streamingDecontaminationFeed(spark, sfDir, statePartitions = Some(2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "vacuous: no contaminated docs in fixture")
  }
}
