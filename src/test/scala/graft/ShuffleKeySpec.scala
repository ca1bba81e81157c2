package graft

import org.apache.spark.sql.DataFrame

/** Pins the round-8 fingerprint discipline: every shuffle-bearing key in
  * the n-gram window/shingle family — aggregate keys, join keys, hash
  * partitionings — must be the 12-byte (xxhash64, length) fingerprint
  * pair, never the raw ~80-100-byte window string. At 100 TB the window
  * shuffle is the wide edge of these operators; a regression that
  * re-introduces the string key would be invisible to the correctness
  * oracle (same results) but ~10× wider on the wire.
  *
  * (At spec scale AQE broadcasts the small sides, so the audit reads
  * aggregate/join KEYS, not just Exchange nodes — the keys are what a
  * 1000-executor plan would hash-partition on.)
  */
class ShuffleKeySpec extends SparkSpec {

  /** Every key list in the physical plan that would drive a shuffle at
    * scale: hashpartitioning args, HashAggregate keys, hash-join keys. */
  private def keyContexts(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1))
    val aggs = "keys=\\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1))
    val joins = "(?:HashJoin|SortMergeJoin) \\[([^\\]]*)\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).flatMap(m => Seq(m.group(1), m.group(2)))
    (parts ++ aggs ++ joins).toSeq
  }

  /** True iff some key list references the RAW string column `name`
    * (attribute form `name#<exprId>`, not the `name_h`/`name_l` pair). */
  private def keysCarry(keys: Seq[String], name: String): Boolean =
    keys.exists(k => s"(^|[(, ])$name#".r.findFirstIn(k).isDefined)

  private def docs = Tables.documents(spark, sfDir)

  test("substringDupSpans keys on fingerprints, not window strings") {
    val keys = keyContexts(graft.ext.DedupOps.substringDupSpans(docs, 13))
    assert(keys.nonEmpty)
    assert(!keysCarry(keys, "win"), s"raw win key in: $keys")
    assert(keys.exists(_.contains("win_h#")), s"fingerprint key missing: $keys")
  }

  test("the shared pair pass keys on fingerprints, not shingle strings") {
    // containment/Jaccard consumers now read the memoized CHECKPOINT of
    // this pass (their own plans carry only doc-id keys), so the
    // fingerprint audit reads the pass's plan itself
    val (common, _) = graft.ext.DedupOps.commonCountsPlan(docs, 3, 1000000L)
    val keys = keyContexts(common)
    assert(!keysCarry(keys, "shingle"), s"raw shingle key in: $keys")
    assert(keys.exists(_.contains("shingle_h#")), s"fingerprint key missing: $keys")
  }

  test("pair-pass consumers never reintroduce a raw shingle key") {
    Seq(keyContexts(graft.ext.DedupOps.containmentTopPairs(docs, 3, 10)),
        keyContexts(graft.ext.DedupOps.ngramJaccardTopPairs(docs, 3, 10)))
      .foreach { keys =>
        assert(keys.nonEmpty)
        assert(!keysCarry(keys, "shingle"), s"raw shingle key in: $keys")
      }
  }

  test("crossSourceOverlap keys on fingerprints, not shingle strings") {
    val keys = keyContexts(graft.ext.TextOps.crossSourceOverlap(docs, 3))
    assert(!keysCarry(keys, "shingle"), s"raw shingle key in: $keys")
    assert(keys.exists(_.contains("sh_h#")), s"fingerprint key missing: $keys")
  }

  test("boilerplateRemove dfs on fingerprints, never raw blocks") {
    val keys = keyContexts(graft.ext.TextOps.boilerplateRemove(docs))
    assert(!keysCarry(keys, "block"), s"raw block key in: $keys")
    assert(!keysCarry(keys, "blk"), s"raw block-array key in: $keys")
    assert(keys.exists(_.contains("bh#")), s"fingerprint key missing: $keys")
  }

  test("incrementalDedup's cross-set join keys on fingerprints") {
    val inc = docs.limit(50)
    val keys = keyContexts(graft.ext.DedupOps.incrementalDedup(inc, docs, 3, 0.5))
    assert(!keysCarry(keys, "shingle"), s"raw shingle key in: $keys")
    assert(keys.exists(_.contains("shingle_h#")), s"fingerprint key missing: $keys")
  }
}
