package graft

import org.apache.spark.sql.functions._
import graft.ext.{PackOps, PiiOps, SampleOps}

/** Round-5 corpus-assembly additions: PII scrub, data-mix rebalancing,
  * global token-budget selection, and the q5 join-shape plan. */
class CorpusAssemblySpec extends SparkSpec {
  import spark.implicits._

  test("PII redact: crafted emails and phones are counted and replaced") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@foo-bar.org today"),
      (2L, "call 555-1234 or 555-9999 now"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = PiiOps.redact(df).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "mail me at <EMAIL> today", 1L, 0L)))
    assert(out(1) == ((2L, "call <PHONE> or <PHONE> now", 0L, 2L)))
    assert(out(2) == ((3L, "nothing sensitive here", 0L, 0L)))
  }

  test("PII injection makes the fixture grading non-vacuous: every row hits") {
    val docs = Tables.documents(spark, sfDir)
    val out = PiiOps.redact(PiiOps.withInjectedPii(docs))
    val n = docs.count()
    assert(out.filter(col("n_emails") >= 1 && col("n_phones") >= 1)
      .count() == n)
    assert(out.filter(col("text_redacted").contains("<EMAIL>") &&
      col("text_redacted").contains("<PHONE>")).count() == n)
    // nothing PII-shaped survives redaction
    assert(out.filter(PiiOps.hasPiiPredicate(col("text_redacted"))).count() == 0)
  }

  test("mix rebalance: cap binds on the over-represented group only") {
    val df = (1L to 4L).map(i => (i, "a")).++(Seq((5L, "b"), (6L, "b")))
      .toDF("doc_id", "lang")
    // mean group size = 3 -> a capped at 3, b (2 rows) kept whole
    val kept = SampleOps.rebalanceToMeanShare(df, "lang", "doc_id")
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("a" -> 3L, "b" -> 2L))
    // deterministic: a second run selects the identical rows
    val again = SampleOps.rebalanceToMeanShare(df, "lang", "doc_id")
    assert(kept.except(again).count() == 0 && again.except(kept).count() == 0)
  }

  test("importance sampling: weight bounds are exact and assignment is stable") {
    val df = (1L to 200L).toDF("doc_id")
      .withColumn("w", when(col("doc_id") <= 100, lit(0)).otherwise(lit(10000)))
    val kept = SampleOps.importanceSample(df, "doc_id", col("w"), 10000)
    assert(kept.filter(col("doc_id") <= 100).count() == 0,
      "weight 0 must never be kept")
    assert(kept.filter(col("doc_id") > 100).count() == 100,
      "weight = scale must always be kept")
    // half-weight keeps a deterministic subset, identical on re-run
    val half = df.withColumn("w", lit(5000))
    val k1 = SampleOps.importanceSample(half, "doc_id", col("w"), 10000)
    val k2 = SampleOps.importanceSample(half, "doc_id", col("w"), 10000)
    assert(k1.except(k2).count() == 0 && k2.except(k1).count() == 0)
    val n = k1.count()
    assert(n > 50 && n < 150, s"half weight should keep roughly half, got $n")
  }

  test("length batches: full batches except per-bucket tails, bounded spread") {
    val docs = Tables.documents(spark, sfDir)
    val out = PackOps.lengthBatches(docs, 32, 8).cache()
    try {
      assert(out.count() === docs.count(), "every doc lands in a batch")
      val sizes = out.groupBy("bucket", "batch_id").count()
      assert(sizes.filter(col("count") > 8).count() === 0,
        "no batch exceeds batchSize")
      val partials = sizes.filter(col("count") < 8)
        .groupBy("bucket").count().filter(col("count") > 1)
      assert(partials.count() === 0, "at most one partial batch per bucket")
      // bucket membership really is length-homogeneous: span < bucketWidth
      val spread = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .join(out, "doc_id")
        .groupBy("bucket").agg((max("n_tok") - min("n_tok")).as("span"))
        .filter(col("span") >= 32)
      assert(spread.count() === 0, "lengths within a bucket span < width")
    } finally out.unpersist()
  }

  test("token budget select: two-level prefix sum equals the global window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val t = docs.withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        expr("(size(array_distinct(words)) * 10000L) div size(words)")
          .as("ttr_i"),
        size(col("words")).cast("long").as("n_tok"))
    val budget = t.agg(floor(sum("n_tok") * 0.5).cast("long")).as[Long].head()
    val naive = t.withColumn("cum_tokens",
        sum("n_tok").over(Window.orderBy(desc("ttr_i"), asc("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tok", "cum_tokens")
    val twoLevel = PackOps.tokenBudgetSelect(docs, 0.5)
    assert(twoLevel.except(naive).count() == 0 &&
      naive.except(twoLevel).count() == 0)
    assert(twoLevel.agg(max("cum_tokens")).as[Long].head() <= budget)
  }

  test("shuffle order: contiguous 0..N-1 permutation equal to the global window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val out = PackOps.shuffleOrder(docs)
    val n = docs.count()
    val (mn, mx, distinct) = out
      .agg(min("pos"), max("pos"), countDistinct("pos"))
      .as[(Long, Long, Long)].head()
    assert((mn, mx, distinct) == ((0L, n - 1, n)))
    val naive = docs.select(col("doc_id"),
      (row_number().over(Window.orderBy(
        pmod(col("doc_id") * 2654435761L, lit(1048576L)), col("doc_id")))
        - 1).cast("long").as("pos"))
    assert(out.except(naive).count() == 0 && naive.except(out).count() == 0)
  }

  test("incremental dedup: crafted increment triages exact/near/kept") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val increment = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // verbatim recrawl
      (11L, "one two three four five six EIGHT"),   // near-dup of 2
      (12L, "totally different words entirely here now")) // novel
      .toDF("doc_id", "text")
    val out = graft.ext.DedupOps.incrementalDedup(increment, corpus, 3, 0.5)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((10L, "exact_dup"), (11L, "near_dup"), (12L, "kept")))
  }

  test("incremental dedup query: every status present on the fixture") {
    val statuses = SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(Set("exact_dup", "near_dup", "kept").subsetOf(statuses.keySet),
      s"vacuous grading: $statuses")
  }

  test("q5 shape: all join edges broadcast, no sort-merge join") {
    val plan = SparkEntry.queries("q5_local_supplier")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }
}
