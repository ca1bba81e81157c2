package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-count invariance of the fingerprint-keyed operator family.
  *
  * The round-10 kernels (NgramFingerprints, TopBigramCount,
  * CdcChunkSpans, CharPolyHash) compute per-row statistics whose graded
  * RESULTS must not depend on how the input happens to be partitioned —
  * at 100 TB the same operator runs over thousands of splits whose
  * boundaries the engine does not control, and a result that shifts
  * with task decomposition would be non-deterministic across cluster
  * sizes. Content-based fingerprints guarantee this by construction
  * (the key is a pure function of the row), but the guarantee spans
  * whole pipelines (explodes, aggregations, broadcast joins, per-source
  * broadcast sets), so this spec pins it end to end: each operator must
  * return IDENTICAL rows over one partition, over seven hash-split
  * partitions, and over a reshuffled row order.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  /** The three adversarial layouts: everything in one task, hash-split
    * across more tasks than the spec session's shuffle partitions, and
    * a row order unrelated to doc_id. */
  private def layouts(df: DataFrame): Seq[DataFrame] = Seq(
    df.repartition(1),
    df.repartition(7, col("doc_id")),
    df.orderBy(desc("doc_id")))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def pinInvariant(name: String)(op: DataFrame => DataFrame): Unit =
    test(s"$name is invariant to input partitioning") {
      val want = rows(op(layouts(docs).head))
      assert(want.nonEmpty, s"$name returned no rows at spec scale")
      layouts(docs).tail.foreach { alt =>
        assert(rows(op(alt)) == want, s"$name shifted with partitioning")
      }
    }

  pinInvariant("repetition")(graft.ext.TextOps.repetition(_))
  pinInvariant("cdcChunks")(graft.ext.TextOps.cdcChunks(_, 16))
  pinInvariant("boilerplateRemove")(graft.ext.TextOps.boilerplateRemove(_))
  pinInvariant("crossSourceOverlap")(graft.ext.TextOps.crossSourceOverlap(_, 3))
  pinInvariant("substringDupSpans")(graft.ext.DedupOps.substringDupSpans(_, 13))
  pinInvariant("decontaminate") { d =>
    // eval side fixed; only the corpus side's layout varies
    graft.ext.DedupOps.decontaminate(d, docs.filter(col("doc_id") % 10 === 0), 13)
  }
  pinInvariant("htmlExtract")(graft.ext.WebOps.htmlExtract(_))
  pinInvariant("urlCanonicalize")(graft.ext.WebOps.urlCanonicalize(_))

  /** The PQ family's own invariance: codes derive from fixed-point
    * centroids (order-insensitive integer sums), so codes — and the ADC
    * ranking built on them — must not shift with the embedding table's
    * layout. */
  test("PQ ADC ranking is invariant to input partitioning") {
    def emb = Tables.embeddings(spark, sfDir)
    val want = rows(graft.ext.SimilarityOps.pqAdcTopK(emb.repartition(1), 0L, 10))
    assert(want.nonEmpty)
    Seq(emb.repartition(7, col("vec_id")), emb.orderBy(desc("vec_id")))
      .foreach { alt =>
        assert(rows(graft.ext.SimilarityOps.pqAdcTopK(alt, 0L, 10)) == want,
          "ADC ranking shifted with partitioning")
      }
  }

  /** The BPE trainer folds exact integer pair counts with a total-order
    * argmax, so the learned merge SEQUENCE — and the encode built on
    * it — must not shift with the corpus's layout. (The memo keys on
    * the canonicalized plan, so each layout below trains fresh.) */
  test("BPE merges + encode are invariant to input partitioning") {
    def m(df: DataFrame) = rows(graft.ext.TextOps.bpeMerges(df, 4))
    def e(df: DataFrame) = rows(graft.ext.TextOps.bpeEncode(df, 4))
    val want = (m(docs.repartition(1)), e(docs.repartition(1)))
    assert(want._1.nonEmpty && want._2.nonEmpty)
    layouts(docs).tail.foreach { alt =>
      assert((m(alt), e(alt)) == want, "BPE shifted with partitioning")
    }
  }
}
