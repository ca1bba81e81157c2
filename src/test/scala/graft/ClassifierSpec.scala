package graft

import org.apache.spark.sql.functions._

/** Distributed logistic-regression training ([[graft.ext.ClassifierOps]]):
  * the GD math, the learning certificate, and the determinism the oracle
  * replay depends on. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("LR training: loss starts at ln 2 and strictly decreases " +
       "across the 3 graded iterations") {
    val rows = ext.ClassifierOps.lrTrain(docs)
      .orderBy("iter")
      .as[(Int, Double, Double, Double, Double, Double)].collect()
    assert(rows.length === 3)
    assert(math.abs(rows(0)._6 - math.log(2.0)) < 1e-6,
      "iteration 1 measures the untrained model: loss must be ln 2")
    assert(rows(1)._6 < rows(0)._6 && rows(2)._6 < rows(1)._6,
      s"log-loss must strictly decrease: ${rows.map(_._6).toSeq}")
  }

  test("LR gradient at w=0 equals the closed form avg(0.5 - y)·x") {
    val f = ext.ClassifierOps.lrQualityFeatures(docs)
    val want = f.select(
      avg(lit(0.5) - col("y")), avg((lit(0.5) - col("y")) * col("x_stop")),
      avg((lit(0.5) - col("y")) * col("x_ttr")),
      avg((lit(0.5) - col("y")) * col("x_len"))).head()
    val got = ext.ClassifierOps.lrTrain(docs, iters = 1)
      .head()
    // w_1 = -g (lrate 1): the emitted weights are the negated gradient
    for (j <- 0 until 4)
      assert(math.abs(got.getDouble(j + 1) + want.getDouble(j)) < 1e-6,
        s"component $j: ${got.getDouble(j + 1)} vs -${want.getDouble(j)}")
  }

  test("LR training is partition-count invariant at the rounded output") {
    val a = ext.ClassifierOps.lrTrain(docs).orderBy("iter")
      .as[(Int, Double, Double, Double, Double, Double)].collect().toSeq
    val b = ext.ClassifierOps.lrTrain(docs.repartition(7)).orderBy("iter")
      .as[(Int, Double, Double, Double, Double, Double)].collect().toSeq
    assert(a === b,
      "rounded weights/loss must not depend on partition fold order")
  }

  test("LR serving: scores are proper probabilities, the gate is the " +
       "0.5 decision boundary, and the scan is shuffle-free") {
    val scored = ext.ClassifierOps.lrScore(docs)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "serving must be a pure map over the corpus — no shuffle")
    val rows = scored.as[(Long, Double, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 > 0.0 && r._2 < 1.0),
      "sigmoid scores must lie strictly inside (0,1)")
    // away from the boundary the rounded score and the raw-margin gate
    // must agree (at the boundary the raw margin is authoritative)
    assert(rows.filter(r => math.abs(r._2 - 0.5) > 1e-5)
      .forall(r => r._3 === (r._2 > 0.5)),
      "kept must be the p > 0.5 decision")
    assert(rows.exists(_._3) , "gate passes nobody — fixture degenerate")
  }

  test("the learned separator beats the majority baseline on its own " +
       "training labels") {
    val f = ext.ClassifierOps.lrQualityFeatures(docs).cache()
    try {
      val w = ext.ClassifierOps.lrTrain(docs).orderBy(desc("iter"))
        .head()
      val z = lit(w.getDouble(1)) + lit(w.getDouble(2)) * col("x_stop") +
        lit(w.getDouble(3)) * col("x_ttr") + lit(w.getDouble(4)) * col("x_len")
      val acc = f.select(
        avg((((z > 0).cast("double")) === col("y")).cast("double"))).head()
        .getDouble(0)
      val majority = {
        val m = f.select(avg("y")).head().getDouble(0)
        math.max(m, 1.0 - m)
      }
      assert(acc >= majority - 1e-9,
        s"3-step model accuracy $acc must reach the majority rate $majority")
    } finally { f.unpersist(); () }
  }
}
