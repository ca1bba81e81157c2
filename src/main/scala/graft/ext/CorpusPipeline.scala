package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-preparation flow a training-data pipeline actually
  * runs, composed from this library's operators into ONE declarative plan:
  *
  *   language gate ([[TextOps.isEnglishPredicate]]) → quality gate
  *   ([[TextOps.qualityOkPredicate]]) → exact dedup (keep the smallest
  *   doc_id per content digest — the windowed form of
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

  def prepare(spark: SparkSession, docs: DataFrame,
              tau: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gates are scan-side FILTERS (pushable, no join, no second scan)
    val kept = docs.filter(
      TextOps.isEnglishPredicate && TextOps.qualityOkPredicate)
    // exact dedup as a window, not an agg+join: keep the smallest doc_id
    // per content digest — one exchange on the digest
    val keptCanon = kept
      .withColumn("__keep", col("doc_id") ===
        min("doc_id").over(Window.partitionBy(md5(col("text").cast("binary")))))
      .filter(col("__keep")).drop("__keep")
    val nearDupLosers = DedupOps.ngramJaccardPairsAbove(keptCanon, 3, tau)
      .select(col("doc_b").as("doc_id")).distinct()
    val survivors = keptCanon.join(nearDupLosers, Seq("doc_id"), "left_anti")
    SampleOps.splitAssign(survivors, "doc_id").select("doc_id", "split")
  }
}
