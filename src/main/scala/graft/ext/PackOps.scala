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

  /** Global token-budget selection: take documents in priority order
    * (type-token-ratio desc — the cheap lexical-diversity signal from
    * [[TextOps.quality]] — tie-break doc_id) until the running token total
    * reaches `frac` of the corpus. The "fill the training budget with the
    * best data first" step of corpus assembly.
    *
    * The priority key is the EXACT integer-scaled ttr
    * `(distinct_words * 10000) div words` — basis-point precision with no
    * floating-point round anywhere, so the ordering (and therefore every
    * cumulative token count) is bit-identical across engines. A double
    * `round(ttr, 4)` here is a correctness trap: Spark rounds doubles
    * HALF_UP via BigDecimal while other engines round the IEEE value, and
    * one ulp at a .5 boundary reorders documents and shifts the whole
    * prefix sum after that point.
    *
    * A naive global cumulative sum is a single-partition window — the
    * classic scale killer. Here the prefix sum is TWO-LEVEL: documents are
    * bucketed by a monotone coarsening of the priority
    * ((ttr_i·B) div 10000 — pure integer arithmetic, trivially monotone),
    * the per-bucket token totals (B rows) produce broadcast prefix
    * OFFSETS, and the exact cumulative position is offset + a
    * within-bucket window — each bucket sorts independently, parallelism
    * B, and the two-level sum equals the global one exactly.
    */
  def tokenBudgetSelect(docs: DataFrame, frac: Double,
                        buckets: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        expr("(size(array_distinct(words)) * 10000L) div size(words)")
          .as("ttr_i"),
        size(col("words")).cast("long").as("n_tok"))
    val budget = t.agg(floor(sum("n_tok") * frac).cast("long").as("budget"))
    val bucketed = t.withColumn("bucket", expr(s"(ttr_i * $buckets) div 10000"))
    val offsets = bucketed.groupBy("bucket").agg(sum("n_tok").as("btok"))
      .withColumn("off", coalesce(
        sum("btok").over(Window.orderBy(desc("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off")
    val w = Window.partitionBy("bucket").orderBy(desc("ttr_i"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), "bucket")
      .withColumn("cum_tokens", col("off") + sum("n_tok").over(w))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("n_tok"), col("cum_tokens"))
  }

  /** Deterministic GLOBAL shuffle order: every document gets a contiguous
    * position 0..N-1 in keyed-hash order — the "shuffle the corpus before
    * packing/epoching" step, reproducible across runs and engines (rerun
    * with the same keys → the same training order; contrast `rand()` or
    * RDD zipWithIndex, which pin nothing). Same two-level discipline as
    * [[tokenBudgetSelect]]: the hash's high bits form the bucket (exact
    * integer division — trivially monotone), bucket counts produce
    * broadcast prefix offsets, and positions are offset + within-bucket
    * row_number. No single-partition window, no RDD round-trip. */
  def shuffleOrder(docs: DataFrame, buckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = 1048576L
    val per = m / buckets
    val b = docs.select(col("doc_id"),
        pmod(col("doc_id") * Mix, lit(m)).as("h"))
      .withColumn("bucket", expr(s"h div $per"))
    val offsets = b.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(
        sum("n").over(Window.orderBy(asc("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off")
    val w = Window.partitionBy("bucket").orderBy(asc("h"), asc("doc_id"))
    b.join(broadcast(offsets), "bucket")
      .withColumn("pos", col("off") + row_number().over(w) - 1)
      .select("doc_id", "pos")
  }

  /** Length-bucketed batch assignment: group documents of similar token
    * length into fixed-size training batches — the padding-minimization
    * step (a batch's cost is its LONGEST member, so mixing lengths wastes
    * compute on pad tokens). bucket = n_tok div `bucketWidth`; within a
    * bucket documents take a deterministic keyed-hash order (reproducible
    * epochs, no rand()) realized with the same TWO-LEVEL prefix pattern
    * as [[shuffleOrder]]: sub-bucket on the hash's high bits (exact
    * integer division — monotone in the hash, so sub order can never
    * contradict hash order), broadcast per-(bucket, sub) offsets, and
    * position = offset + within-sub row_number. No bucket ever sorts in
    * one task; parallelism is buckets × subBuckets regardless of corpus
    * size. batch_id = position div `batchSize`. */
  def lengthBatches(docs: DataFrame, bucketWidth: Int, batchSize: Int,
                    subBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = 1048576L
    val per = m / subBuckets
    val t = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("bucket", expr(s"n_tok div $bucketWidth"))
      .withColumn("h", pmod(col("doc_id") * Mix, lit(m)))
      .withColumn("sub", expr(s"h div $per"))
    val offsets = t.groupBy("bucket", "sub").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(
        sum("n").over(Window.partitionBy("bucket").orderBy(asc("sub"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "sub", "off")
    val w = Window.partitionBy("bucket", "sub")
      .orderBy(asc("h"), asc("doc_id"))
    t.join(broadcast(offsets), Seq("bucket", "sub"))
      .withColumn("pos", col("off") + row_number().over(w) - 1)
      .select(col("doc_id"), col("bucket"),
        expr(s"pos div $batchSize").as("batch_id"))
  }

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
