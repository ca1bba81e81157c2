package graft

import org.apache.spark.sql.functions._
import graft.ext.SimilarityOps

/** The LSH band gate in front of the within-label exact-cosine pair search:
  * on a maximally skewed label (every vector in ONE cell — the case that
  * kills a plain within-label quadratic at 100 TB) the candidate set must
  * be far below n²/2 while still catching every planted near-dup; and on
  * the uniform synthetic fixture the default gate must degrade to the
  * exact result (that is what keeps dedup_embedding_cosine oracle-green). */
class BandGateSpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim deterministic pseudo-random vector for seed `i`. */
  private def vec(i: Long): Seq[Float] =
    (0 until 64).map { j =>
      (((i * 64 + j) * 2654435761L % 997).toFloat / 997f) - 0.5f
    }

  /** Skewed fixture: 120 vectors, ALL in label 0; vectors 100..109 are
    * near-clones of 0..9 (one coordinate nudged) — 10 planted dup pairs
    * with cosine ≈ 0.99 against a background of ≈ 0. */
  private lazy val skewed = {
    val background = (0L until 100L).map(i => (i, vec(i), 0))
    val clones = (0L until 10L).map { i =>
      val v = vec(i).toArray
      v(7) = v(7) + 0.01f
      (100L + i, v.toSeq, 0)
    }
    (background ++ clones).toDF("vec_id", "embedding", "label")
  }

  test("band gate prunes the skewed-label quadratic hard") {
    val n = skewed.count()
    val allPairs = n * (n - 1) / 2
    val cands = SimilarityOps.bandCandidatePairs(skewed, bands = 8, bitsPerBand = 8)
    val nCands = cands.count()
    assert(nCands < allPairs / 4,
      s"selective gate expected: $nCands candidates vs $allPairs all-pairs")
  }

  test("band gate keeps every planted near-dup pair") {
    val cands = SimilarityOps.bandCandidatePairs(skewed, bands = 8, bitsPerBand = 8)
      .as[(Long, Long)].collect().toSet
    (0L until 10L).foreach { i =>
      assert(cands.contains((i, 100L + i)),
        s"planted near-dup ($i, ${100 + i}) must survive the gate")
    }
    val top = SimilarityOps.nearDupPairsWithinLabel(skewed, 10, bands = 8, bitsPerBand = 8)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(top === (0L until 10L).map(i => (i, 100L + i)).toSet,
      "exact-cosine verify must rank the planted pairs top")
  }

  test("native hyperplane signature is bit-identical to the HOF specification") {
    graft.functions.GraftExtensions.register(spark)
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val native = base.select(col("vec_id"),
      call_function("hyperplane_sig", col("v"), lit(64)).as("sig"))
    val hof = base.select(col("vec_id"),
      SimilarityOps.packedSignsHof(64).as("sig"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native and HOF signatures must agree bit-for-bit")
  }

  test("default gate equals the exact within-label top-k on the uniform fixture") {
    val emb = Tables.embeddings(spark, sfDir)
    val gated = SimilarityOps.nearDupPairsWithinLabel(emb, 20)
      .as[(Long, Long, Double)].collect().toSeq
    // exact reference: plain within-label all-pairs
    val base = emb.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val exact = base.select(col("label"), col("vec_id").as("vec_a"), col("v").as("va"))
      .join(base.select(col("label"), col("vec_id").as("vec_b"), col("v").as("vb")), "label")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(expr("""aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, b) -> a + b)
                      / (sqrt(aggregate(transform(va, x -> x * x), 0D, (a, b) -> a + b))
                         * sqrt(aggregate(transform(vb, x -> x * x), 0D, (a, b) -> a + b)))"""), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), asc("vec_a"), asc("vec_b"))
      .limit(20)
      .as[(Long, Long, Double)].collect().toSeq
    assert(gated === exact, "gate must not change the oracle-checked result")
  }
}
