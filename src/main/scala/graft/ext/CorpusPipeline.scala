package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-preparation flow a training-data pipeline actually
  * runs, composed from this library's operators into ONE declarative plan:
  *
  *   language gate ([[TextOps.isEnglishPredicate]]) → quality gate
  *   ([[TextOps.qualityOkPredicate]]) → exact dedup (keep the smallest
  *   doc_id per content digest — the narrow digest-aggregation form of
  *   [[graft.ops.Dedup.exactByContent]]) → near-dup removal (drop the
  *   larger id of every exact-Jaccard ≥ `tau` pair,
  *   [[DedupOps.ngramJaccardPairs]]) → deterministic train/val/test split
  *   ([[SampleOps.splitAssign]]).
  *
  * Every stage is deterministic and SQL-expressible, so the whole pipeline
  * is graded end-to-end by the differential oracle — the composition test
  * that individual per-operator checks can't give. Scale shape: the gates
  * are scan-side FILTERS (no join, no second scan of the corpus), exact
  * dedup shuffles one digest per doc, near-dup is the inverted-index
  * join confined to gate survivors, and the split is pure column math.
  */
object CorpusPipeline {

  /** [[prepare]] extended with the round-5 gates — the full modern
    * pretraining recipe in one declarative plan:
    *
    *   language → quality → repetition (Gopher, [[TextOps.repetition]])
    *   → benchmark decontamination against the held-out eval split
    *   ([[DedupOps.decontaminate]]) → exact dedup → near-dup removal →
    *   deterministic split.
    *
    * Ordering is the cost gradient: pure scan predicates first, then the
    * two aggregation-backed gates confined to gate survivors, then the
    * joins. Every stage is subset-closed (a doc's repetition stats,
    * contamination flag, digest, and pairwise Jaccard depend only on the
    * docs involved, not on what was filtered before), which is what lets
    * ONE differential SQL oracle grade the whole composition. */
  def prepareFull(spark: SparkSession, docs: DataFrame,
                  tau: Double = 0.5, evalMod: Int = 20): DataFrame = {
    val eval = docs.filter(pmod(col("doc_id"), lit(evalMod)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
    // The gate survivors feed three consumers, but a materialization was
    // MEASURED AND REJECTED here (7.3 → 9.6 s at sf0.1): the gates are
    // cheap codegen'd scan predicates, so re-deriving `kept` per consumer
    // costs less than a localCheckpoint round-trip — the opposite
    // trade-off from DedupOps.ngramJaccardPairs' exploded shingle set.
    val kept = corpus.filter(
      TextOps.isEnglishPredicate && TextOps.qualityOkPredicate)
    val repKeep = TextOps.repetition(kept).filter(col("keep")).select("doc_id")
    val keptRep = kept.join(repKeep, "doc_id")
    val contaminated = DedupOps.decontaminate(keptRep, eval)
      .filter(col("contaminated")).select("doc_id")
    val clean = keptRep.join(contaminated, Seq("doc_id"), "left_anti")
    // exact dedup as ONE NARROW aggregation — [[graft.ops.Dedup
    // .exactByContent]]'s shape, reused: everything downstream needs only
    // doc_id, so the shuffle carries (digest, doc_id) pairs, never the
    // text. The previous window form (min over partitionBy(md5(text)))
    // shuffled the FULL ROW and sorted it within partitions; at 100 TB
    // that is the difference between shuffling the corpus and shuffling
    // its digests.
    val canon = graft.ops.Dedup.exactByContent(clean).select("doc_id")
    val survivors = canon.join(nearDupLosers(docs, canon, tau),
      Seq("doc_id"), "left_anti")
    SampleOps.splitAssign(survivors, "doc_id").select("doc_id", "split")
  }

  /** Near-dup losers of `canon`, served from the FULL-corpus Jaccard
    * truth. Jaccard is a pairwise function of the two documents alone
    * (subset-closed), so the pair set computed over `docs` and restricted
    * to pairs whose BOTH endpoints survived the gates is identical to the
    * pair set computed over the gated corpus — and the full-corpus truth
    * is already built once per session for the recall audits and cluster
    * edges ([[DedupOps.truthPairsAbove]]'s memo), so both corpus
    * pipelines ride it for free instead of re-running their own Σ df²
    * inverted-index joins. The restriction is two semi-joins against the
    * survivor ids; the pair side is the tiny checkpointed truth. */
  private def nearDupLosers(docs: DataFrame, canon: DataFrame,
                            tau: Double): DataFrame =
    DedupOps.truthPairsAbove(docs, 3, tau)
      .join(canon.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(canon.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .select(col("doc_b").as("doc_id")).distinct()

  def prepare(spark: SparkSession, docs: DataFrame,
              tau: Double = 0.5): DataFrame = {
    // gates are scan-side FILTERS (pushable, no join, no second scan)
    val kept = docs.filter(
      TextOps.isEnglishPredicate && TextOps.qualityOkPredicate)
    // exact dedup as ONE NARROW aggregation (see prepareFull): only
    // doc_id flows downstream — Dedup.exactByContent shuffles
    // (digest, doc_id) pairs, never the text the window form used to move
    val keptCanon = graft.ops.Dedup.exactByContent(kept).select("doc_id")
    val survivors = keptCanon.join(nearDupLosers(docs, keptCanon, tau),
      Seq("doc_id"), "left_anti")
    SampleOps.splitAssign(survivors, "doc_id").select("doc_id", "split")
  }
}
