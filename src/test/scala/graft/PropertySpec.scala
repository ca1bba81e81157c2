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
}
