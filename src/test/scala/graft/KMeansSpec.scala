package graft

import graft.ext.SimilarityOps

/** kmeansCells semantics + plan shape: the assignment must equal a plain
  * driver-side Lloyd reference (cosine argmax, ties to smaller cell), and
  * the assignment stage must be a pure map-side projection — zero
  * Exchange — because at 100 TB an N×k shuffle per iteration is the
  * difference between minutes and hours. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** Driver-side reference: identical init (label cells) and identical
    * update rule (fixed-point 2^24 long-summed mean centroid — the
    * engine's order-insensitive form, HALF_UP ties like Spark's round —
    * unit-normalize, dot-product argmax with strict > in ascending cell
    * order). */
  private def referenceAssign(iters: Int): Map[Long, Long] = {
    val rows = emb.select($"vec_id", $"label".cast("long"), $"embedding")
      .as[(Long, Long, Seq[Float])].collect()
      .map { case (id, lab, e) => (id, lab, e.map(_.toDouble).toArray) }
      .sortBy(_._1)
    var cells: Map[Long, Long] = rows.map(r => r._1 -> r._2).toMap
    val dim = rows.head._3.length
    (1 to iters).foreach { _ =>
      val cents = rows.groupBy(r => cells(r._1)).map { case (cell, rs) =>
        val sum = new Array[Long](dim)
        rs.foreach(r => (0 until dim).foreach(i => sum(i) +=
          BigDecimal(r._3(i) * 16777216.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
        val mean = sum.map(s => (s.toDouble / 16777216.0) / rs.length)
        val n = math.sqrt(mean.map(x => x * x).sum)
        cell -> mean.map(_ / n)
      }.toSeq.sortBy(_._1)
      cells = rows.map { r =>
        var bestCell = -1L; var bestSim = Double.NegativeInfinity
        cents.foreach { case (cell, cv) =>
          var d = 0.0
          (0 until dim).foreach(i => d += r._3(i) * cv(i))
          if (d > bestSim) { bestSim = d; bestCell = cell }
        }
        r._1 -> bestCell
      }.toMap
    }
    cells
  }

  test("kmeansCells matches the driver-side Lloyd reference") {
    val got = SimilarityOps.kmeansCells(emb, 2)
      .as[(Long, Long)].collect().toMap
    val want = referenceAssign(2)
    assert(got.size === want.size)
    val diff = got.filter { case (id, c) => want(id) != c }
    assert(diff.isEmpty, s"assignments diverge for ${diff.take(5)}")
  }

  test("kmeans refinement moves vectors off the label init") {
    val refined = SimilarityOps.kmeansCells(emb, 2)
      .as[(Long, Long)].collect().toMap
    val init = emb.select($"vec_id", $"label".cast("long"))
      .as[(Long, Long)].collect().toMap
    // synthetic labels are random, so refinement must reassign something
    assert(refined.exists { case (id, c) => init(id) != c },
      "2 Lloyd iterations should move at least one vector")
  }

  test("assignment stage is map-side only: zero SHUFFLE in the final plan") {
    val plan = SimilarityOps.kmeansCells(emb, 2)
      .queryExecution.executedPlan.toString
    // the one-row centroid broadcast (BroadcastExchange over a
    // LocalTableScan — k·d doubles, independent of N) is the compile-once
    // delivery path and is NOT a shuffle; what must never appear is a
    // shuffle Exchange — which Spark prints as "Exchange
    // hashpartitioning(...)" / "Exchange rangepartitioning(...)" (the
    // node NAME is just "Exchange", so a class-name needle like
    // "ShuffleExchange" would never match and pin nothing)
    assert(!("Exchange (hash|range|SinglePartition)".r.findFirstIn(plan).isDefined),
      s"assignment must not shuffle (N×k regression):\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"),
      s"centroids must arrive via the one-row broadcast:\n$plan")
  }
}
