package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Aggregates, Dedup}
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Ev

/** Property tests (SURVEY §5.3): ∀ random vote batches —
  * (a) tally conservation, (b) dedup idempotence + bound,
  * (c) batch ≡ stream (Structured Streaming prefix consistency).
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val evGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 10000L)
    secs <- Gen.choose(0L, 86400L)
    user <- Gen.choose(0L, 50L)
    typ <- Gen.oneOf("click", "view", "purchase")
    v <- Gen.choose(0, 10000).map(_ / 100.0)
  } yield Ev(id, new Timestamp(1704067200000L + secs * 1000), user, typ, v)

  private val batchGen = Gen.listOfN(60, evGen)

  private def samples(n: Int, seed0: Long): Seq[List[Ev]] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed0))(_.next)
      .map(s => batchGen.apply(params, s))
      .collect { case Some(b) => b }
      .take(n).toSeq
  }

  test("tally conservation and dedup bound hold for random batches") {
    samples(5, 42L).foreach { batch =>
      val df = batch.toDF()
      val total = Aggregates.votesPerCandidate(df)
        .agg(sum("n_events")).as[Long].head()
      assert(total === batch.size.toLong)

      val dd = Dedup.firstPerKey(df, "user_id", "event_id")
      assert(dd.count() === df.select("user_id").distinct().count())
      val dd2 = Dedup.firstPerKey(dd, "user_id", "event_id")
      assert(dd.exceptAll(dd2).isEmpty)
    }
  }

  /** Skew-biased generator: ~80% of events land on one hot key. */
  private val skewedEvGen: Gen[Ev] = for {
    e <- evGen
    hot <- Gen.choose(0, 9)
  } yield if (hot < 8) e.copy(event_type = "landslide") else e

  test("salted aggregation equals plain aggregation for arbitrary skews") {
    val gen = Gen.listOfN(80, skewedEvGen)
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(1234L))(_.next)
      .map(s => gen.apply(params, s))
      .collect { case Some(b) => b }
      .take(5).foreach { batch =>
        val df = batch.toDF()
        def toMap(r: org.apache.spark.sql.DataFrame) =
          r.as[(String, Double, Long)].collect()
            .map { case (t, v, n) => t -> (v, n) }.toMap
        assert(toMap(Aggregates.votesPerCandidateSalted(df)) ===
               toMap(Aggregates.votesPerCandidate(df)))
      }
  }

  test("streaming complete-mode agg equals batch agg for random batches") {
    samples(3, 7L).foreach { batch =>
      val streamed = StreamOps.runStream(spark, batch, nBatches = 3, "complete") {
        _.groupBy("event_type").agg(round(sum("value"), 2).as("t"),
                                    count(lit(1)).as("n"))
      }.as[(String, Double, Long)].collect().toSet
      val batched = batch.toDF()
        .groupBy("event_type").agg(round(sum("value"), 2).as("t"),
                                   count(lit(1)).as("n"))
        .as[(String, Double, Long)].collect().toSet
      assert(streamed === batched)
    }
  }

  // random word-soup corpora for the text/dedup invariants
  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 1000L)
    n <- Gen.choose(1, 40)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee", "fff"))
  } yield (id, ws.mkString(" "))

  private def corpora(n: Int, seed0: Long): Seq[Seq[(Long, String)]] = {
    val g = Gen.listOfN(30, docGen)
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed0))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(b) => b.distinctBy(_._1) }
      .take(n).toSeq
  }

  test("substring-span and decontamination invariants hold for random corpora") {
    import graft.ext.DedupOps
    corpora(4, 7L).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val spans = DedupOps.substringDupSpans(df, w = 5)
        .as[(Long, Long, Long, Double)].collect()
      // duplicated windows never exceed total; fraction in [0, 1]
      assert(spans.forall { case (_, n, d, f) => d <= n && f >= 0.0 && f <= 1.0 })
      // every doc long enough to have a window appears in the output
      val eligible = docs.count(_._2.split(" ").length >= 5)
      assert(spans.length === eligible)

      // decontaminating a corpus against ITSELF flags exactly the docs
      // that have at least one window (every window trivially overlaps)
      val self = DedupOps.decontaminate(df, df, w = 5)
        .as[(Long, Long, Boolean)].collect()
      assert(self.length === docs.size)
      assert(self.forall { case (id, _, c) =>
        c === (docs.find(_._1 == id).get._2.split(" ").length >= 5) })
    }
  }

  test("repetition and unigram-score invariants hold for random corpora") {
    import graft.ext.TextOps
    corpora(4, 11L).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val rep = TextOps.repetition(df)
        .as[(Long, Double, Double, Boolean)].collect()
      // fractions bounded; keep consistent with its own thresholds
      assert(rep.forall { case (_, tb, dw, keep) =>
        tb > 0.0 && tb <= 1.0 && dw >= 0.0 && dw < 1.0 &&
          keep === (tb <= 0.18 && dw <= 0.9) })

      // unigram log-probs are strictly negative unless a doc's every
      // token is the whole corpus (impossible with >1 distinct token)
      val us = TextOps.unigramScore(df)
        .as[(Long, Double, Long)].collect()
      assert(us.length === docs.size)
      val vocabSize = docs.flatMap(_._2.split(" ")).distinct.size
      if (vocabSize > 1) assert(us.forall(_._2 < 0.0))
      // token counts conserved
      assert(us.map(_._3).sum === docs.map(_._2.split(" ").length.toLong).sum)
    }
  }
}
