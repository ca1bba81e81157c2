package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-token-budget
  * sequences (the "sample packing" step that keeps GPU context windows
  * full). Documents are sharded deterministically (keyed hash — replays
  * stable, like every assignment in [[SampleOps]]), ordered by doc_id
  * within a shard, and packed greedily: a sequence takes consecutive docs
  * until the next one would overflow `budget`; an oversized doc gets a
  * sequence of its own.
  *
  * Scale shape: one hash-repartition + in-partition sort (Spark's shuffle
  * machinery, no per-group buffering), then a single streaming pass per
  * partition carrying O(1) state — the [[graft.ops.Sessionize]]
  * secondary-sort pattern applied to packing. Shards are independent, so
  * parallelism is `shards` regardless of corpus size.
  */
object PackOps {

  private val Mix = 2654435761L

  def packSequences(docs: DataFrame, budget: Int, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        pmod(col("doc_id") * Mix, lit(shards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several shards may share a partition; state resets per shard
        var curShard = Long.MinValue
        var seq = 0L
        var acc = 0L
        it.map { case (id, sh, n) =>
          if (sh != curShard) { curShard = sh; seq = 0L; acc = 0L }
          if (acc > 0 && acc + n > budget) { seq += 1; acc = 0L }
          acc += n
          (id, sh, seq)
        }
      }
      .toDF("doc_id", "shard", "seq_id")
  }
}
