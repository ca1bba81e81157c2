package graft

import org.apache.spark.sql.functions._

import graft.ext.CorpusPipeline

/** Engine-side structural invariants for the end-to-end corpus
  * pipelines (both are ALSO graded by full-recipe DuckDB differential
  * oracles; these localize a break to a boundary condition). */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("prepareFull: survivors are unique non-eval docs with valid splits") {
    val docs = Tables.documents(spark, sfDir)
    val out = CorpusPipeline.prepareFull(spark, docs).cache()
    try {
      val ids = out.select("doc_id").as[Long].collect()
      assert(ids.nonEmpty, "the fixture corpus must keep some survivors")
      assert(ids.length === ids.distinct.length, "no doc may survive twice")
      // the eval split (doc_id % 20 == 0) is held out BEFORE the gates —
      // an eval doc in the output is train/eval leakage by construction
      assert(ids.forall(_ % 20 != 0), "no eval doc may enter the corpus")
      val splits = out.select("split").distinct().as[String].collect().toSet
      assert(splits.subsetOf(Set("train", "val", "test")), splits.toString)
    } finally { out.unpersist(); () }
  }

  test("prepareFull survivors individually pass every per-doc gate") {
    // the per-doc gates are pure predicates of one document, so each
    // survivor must pass them in isolation — a survivor failing a gate
    // means the composition filtered on the wrong column somewhere
    // (cross-doc stages — dedup, decontamination — are the oracle's job)
    val docs = Tables.documents(spark, sfDir)
    val out = CorpusPipeline.prepareFull(spark, docs)
    val gated = docs
      .filter(graft.ext.TextOps.isEnglishPredicate &&
              graft.ext.TextOps.qualityOkPredicate)
      .select("doc_id")
    assert(out.join(gated, Seq("doc_id"), "left_anti").count() === 0,
      "every survivor must pass the scan gates individually")
    val repKeep = graft.ext.TextOps.repetition(docs)
      .filter(col("keep")).select("doc_id")
    assert(out.join(repKeep, Seq("doc_id"), "left_anti").count() === 0,
      "every survivor must pass the repetition gate individually")
  }
}
