package graft

import org.apache.spark.sql.functions._
import graft.ext.SimilarityOps
import graft.functions.GraftExtensions

/** Native argmax-dot cell assignment ([[graft.functions.CentroidArgmax]])
  * and the compile-once Lloyd loop it unlocks: correctness, tie-break,
  * codegen/interpreted parity, and the large-k multi-round bound the
  * `typedLit`-literal form could not meet (each round re-compiled a
  * generated class inlining k·d doubles). */
class CentroidArgmaxSpec extends SparkSpec {
  import spark.implicits._

  private def assignSql(v: String, cents: String) =
    s"centroid_argmax($v, $cents)"

  test("known values: picks the max-dot cell; ties go to the smaller id") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT centroid_argmax(array(1.0D, 0.0D),
           array(named_struct('c', 7L, 'u', array(0.0D, 1.0D)),
                 named_struct('c', 9L, 'u', array(1.0D, 0.0D)))) AS cell""")
      .as[Long].head()
    assert(r === 9L, "unit x-axis vector belongs to the x-axis centroid")
    // exact tie between cells 3 and 5: strict > keeps the first (3)
    val tie = spark.sql(
      """SELECT centroid_argmax(array(1.0D, 1.0D),
           array(named_struct('c', 3L, 'u', array(1.0D, 0.0D)),
                 named_struct('c', 5L, 'u', array(0.0D, 1.0D)))) AS cell""")
      .as[Long].head()
    assert(tie === 3L, "dot ties must resolve to the smaller cell id")
  }

  test("codegen and interpreted paths agree") {
    GraftExtensions.register(spark)
    val q = s"""SELECT ${assignSql(
      "array(0.5D, -1.5D, 2.0D)",
      """array(named_struct('c', 1L, 'u', array(1.0D, 0.0D, 0.0D)),
               named_struct('c', 2L, 'u', array(0.0D, 0.0D, 1.0D)))""")} AS cell"""
    val viaCodegen = spark.sql(q).as[Long].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val viaInterp =
      try spark.sql(q).as[Long].head()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(viaCodegen === viaInterp)
  }

  test("kmeansCells assignment equals a driver-side argmax replay") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = SimilarityOps.kmeansCells(emb, 1)
      .as[(Long, Long)].collect().toMap
    // replay iteration 1 in plain Scala: label-cell fixed-point means,
    // unit-normalize, argmax dot with ties to the smaller cell
    val rows = emb
      .select(col("vec_id"), col("label").cast("long").as("cell"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Long, Long, Seq[Double])].collect()
    val cents = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (cell, g) =>
      val d = g.head._3.size
      val mean = (0 until d).map { j =>
        val s = g.map(r => math.round(r._3(j) * 16777216.0)).sum
        (s.toDouble / 16777216.0) / g.size
      }
      val n = math.sqrt(mean.map(x => x * x).sum)
      (cell, mean.map(_ / n))
    }
    rows.foreach { case (id, _, v) =>
      val best = cents.foldLeft((-1L, Double.NegativeInfinity)) {
        case ((bc, bd), (cell, u)) =>
          val dot = v.zip(u).map { case (a, b) => a * b }.sum
          if (dot > bd) (cell, dot) else (bc, bd)
      }._1
      assert(got(id) === best, s"vec $id assigned to the wrong cell")
    }
  }

  test("k=500 Lloyd: >=3 rounds complete in bounded time (compile-once)") {
    // one cell per vector: the worst case for the literal-embedding form,
    // whose per-round codegen grew with k·d. With the broadcast-column
    // assignment the class is cached after round one, so three rounds at
    // k=500 stay well inside an interactive bound.
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("label", (col("vec_id") % 500).cast("int"))
    val t0 = System.nanoTime()
    val out = SimilarityOps.kmeansCells(emb, 3).as[(Long, Long)].collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length === 500)
    assert(out.map(_._2).toSet.subsetOf((0L until 500L).toSet))
    assert(sec < 90.0, f"3 rounds at k=500 took $sec%.1f s — recompiling?")
  }
}
