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

  /** Draw `n` deterministic samples of `gen` from a fixed seed chain —
    * the one boilerplate every replay test shares. */
  private def drawn[A](gen: Gen[A], seed0: Long, n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed0))(_.next)
      .map(s => gen.apply(params, s))
      .collect { case Some(b) => b }
      .take(n).toSeq
  }

  /** Spark's HALF_UP round(col, s), replayed. */
  private def halfUp(x: Double, s: Int): Double =
    BigDecimal.valueOf(x)
      .setScale(s, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** unix_timestamp's floor-to-second, replayed. */
  private def floorSec(ms: Long): Long = Math.floorDiv(ms, 1000L)

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
      // the kept (key, tiebreak) pair is deterministic even when ids
      // collide: always the user's minimum event_id
      val pairs = dd.select("user_id", "event_id")
        .as[(Long, Long)].collect().toMap
      val want = batch.groupBy(_.user_id)
        .map { case (u, es) => u -> es.map(_.event_id).min }
      assert(pairs === want, "first-per-key did not keep the min tiebreak")
    }
  }

  /** Skew-biased generator: ~80% of events land on one hot key. */
  private val skewedEvGen: Gen[Ev] = for {
    e <- evGen
    hot <- Gen.choose(0, 9)
  } yield if (hot < 8) e.copy(event_type = "landslide") else e

  test("salted aggregation equals plain aggregation for arbitrary skews") {
    drawn(Gen.listOfN(80, skewedEvGen), 1234L, 5).foreach { batch =>
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

  test("ngram fingerprints are faithful to window-string identity on random corpora") {
    // the kernel keys must induce exactly the equivalence classes the
    // joined window STRINGS induce: same distinct-count per doc, and the
    // same cross-doc shared-window multiset — a mixing bug (e.g. an
    // order-insensitive combine conflating (a,b) with (b,a)) or an
    // accidental collision would break one of these
    graft.functions.GraftExtensions.register(spark)
    corpora(4, 23L).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
      val byString = df.select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))"))
            .as("win"))
      val byKernel = df.select(col("doc_id"),
          explode(expr("ngram_fingerprints(words, 3)")).as("win"))
      def shape(d: org.apache.spark.sql.DataFrame) = (
        d.distinct().count(),
        d.groupBy("doc_id").agg(countDistinct("win").as("n"))
          .as[(Long, Long)].collect().toMap,
        d.distinct().groupBy("win").count()
          .groupBy("count").count().as[(Long, Long)].collect().toMap)
      assert(shape(byString) === shape(byKernel))
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

  test("corpus-assembly invariants hold for random corpora") {
    import graft.ext.{PackOps, PiiOps, SampleOps}
    import org.apache.spark.sql.expressions.Window
    corpora(4, 13L).foreach { docs =>
      val langs = Array("en", "de", "fr")
      val df = docs.toDF("doc_id", "text")
        .withColumn("lang",
          element_at(lit(langs), (pmod(col("doc_id"), lit(3)) + 1).cast("int")))

      // rebalance: per-group kept = min(n_before, floor(mean group size))
      val before = df.groupBy("lang").count().as[(String, Long)].collect().toMap
      val cap = before.values.sum / before.size
      val kept = SampleOps.rebalanceToMeanShare(df, "lang", "doc_id")
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      before.foreach { case (l, n) =>
        assert(kept.getOrElse(l, 0L) === math.min(n, cap), s"lang $l") }

      // token budget: two-level == naive global window, budget respected
      val t = df.withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          expr("(size(array_distinct(words)) * 10000L) div size(words)").as("ttr_i"),
          size(col("words")).cast("long").as("n_tok"))
      val budget = t.agg(floor(sum("n_tok") * 0.5).cast("long")).as[Long].head()
      val naive = t.withColumn("cum_tokens",
          sum("n_tok").over(Window.orderBy(desc("ttr_i"), asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_tokens") <= budget)
        .select("doc_id", "n_tok", "cum_tokens")
      val two = PackOps.tokenBudgetSelect(df, 0.5)
      assert(two.except(naive).count() === 0 && naive.except(two).count() === 0)

      // PII redaction is a fixpoint: a second pass finds nothing
      val once = PiiOps.redact(PiiOps.withInjectedPii(df))
        .select(col("doc_id"), col("text_redacted").as("text"))
      val twice = PiiOps.redact(once)
      assert(twice.agg(sum("n_emails") + sum("n_phones")).as[Long].head() === 0L)
    }
  }

  test("incremental dedup statuses partition the increment for random corpora") {
    import graft.ext.DedupOps
    corpora(4, 17L).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val corpus = df.filter(col("doc_id") % 2 === 0)
      val increment = df.filter(col("doc_id") % 2 === 1)
        // plant one guaranteed recrawl when the corpus is non-empty
        .union(corpus.orderBy("doc_id").limit(1)
          .select(col("doc_id") + 100000, col("text")))
      val out = DedupOps.incrementalDedup(increment, corpus, 3, 0.5)
      // statuses partition the increment: one verdict per input row
      assert(out.count() === increment.count())
      assert(out.select("doc_id").distinct().count() === increment.count())
      // exact_dup <=> digest present in the corpus
      val corpDigests = corpus.select(md5(col("text"))).as[String].collect().toSet
      val verdicts = increment.select(col("doc_id"), md5(col("text")).as("dig"))
        .join(out, "doc_id").as[(Long, String, String)].collect()
      verdicts.foreach { case (id, dig, status) =>
        assert((status == "exact_dup") === corpDigests.contains(dig),
          s"doc $id: status $status vs digest-in-corpus ${corpDigests.contains(dig)}")
      }
    }
  }

  test("OHLC bars match a driver-side per-bar replay for random batches") {
    import graft.ops.EventAnalytics
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
      .withZone(java.time.ZoneOffset.UTC)
    samples(4, 99L).foreach { batch =>
      // unique per-row timestamps: min_by/max_by keys must be total
      val uniq = batch.zipWithIndex.map { case (e, i) =>
        e.copy(ts = new Timestamp(1704067200000L + i * 1237L))
      }
      val got = EventAnalytics.ohlcBars(uniq.toDF(), 900)
        .as[(String, String, Double, Double, Double, Double, Long, Double)]
        .collect().map(r => ((r._1, r._2), (r._3, r._4, r._5, r._6, r._7)))
        .toMap
      val want = uniq.groupBy(e => (e.event_type,
          fmt.format(java.time.Instant.ofEpochSecond(
            e.ts.getTime / 1000 / 900 * 900))))
        .map { case (k, es) =>
          val sorted = es.sortBy(_.ts.getTime)
          def r2(x: Double) = BigDecimal(x)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
          k -> (r2(sorted.head.value), r2(es.map(_.value).max),
            r2(es.map(_.value).min), r2(sorted.last.value), es.size.toLong)
        }
      assert(got === want)
    }
  }

  test("importance sampling keeps exactly the hash-below-weight rows, monotone in weight") {
    import graft.ext.SampleOps
    val mix = 2654435761L
    samples(4, 123L).foreach { batch =>
      val df = batch.toDF()
        .select(col("event_id").as("doc_id"),
          (col("user_id") * 200L % 10001L).cast("int").as("w"))
        .distinct()
      val kept = SampleOps.importanceSample(df, "doc_id", col("w"), 10000)
        .select("doc_id").as[Long].collect().toSet
      val want = df.as[(Long, Int)].collect()
        .filter { case (id, w) => java.lang.Math.floorMod(id * mix, 10000L) < w }
        .map(_._1).toSet
      assert(kept === want)
      // raising every weight only ever ADDS rows
      val boosted = SampleOps.importanceSample(
        df.withColumn("w", least(col("w") + 2000, lit(10000))),
        "doc_id", col("w"), 10000)
        .select("doc_id").as[Long].collect().toSet
      assert(kept.subsetOf(boosted))
    }
  }

  /** Tie-heavy generator for the as-of differentials: sub-second ms
    * offsets (the unix_timestamp second-truncation seam), few users, a
    * narrow second range, and colliding event_ids — exactly the ties
    * the fixture's wide id/ts space almost never produces. */
  private val tieEvGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 40L)
    secs <- Gen.choose(0L, 30L)
    ms <- Gen.oneOf(0L, 250L, 500L, 750L)
    user <- Gen.choose(0L, 3L)
    typ <- Gen.oneOf("click", "view", "purchase")
  } yield Ev(id, new Timestamp(1704067200000L + secs * 1000 + ms), user, typ, 1.0)

  test("as-of joins match a driver-side replay on tie-heavy random batches") {
    import graft.ops.AsOfJoin
    val tol = 5L
    type Row4 = (Long, Long, Option[Long], Option[Long])
    def brute(batch: List[Ev], forward: Boolean): Seq[Row4] =
      batch.filter(_.event_type == "purchase").map { l =>
        val cands = batch.filter(e => e.event_type == "click" &&
          e.user_id == l.user_id &&
          (if (forward) e.ts.getTime >= l.ts.getTime
           else e.ts.getTime <= l.ts.getTime))
        // backward: latest ts wins; forward: earliest ts wins — at
        // equal ts both directions keep the larger event_id
        val best = cands.sortBy(e =>
          (if (forward) e.ts.getTime else -e.ts.getTime, -e.event_id))
          .headOption
        val gap = best.map(r =>
          if (forward) floorSec(r.ts.getTime) - floorSec(l.ts.getTime)
          else floorSec(l.ts.getTime) - floorSec(r.ts.getTime))
        val in = best.nonEmpty && gap.get <= tol
        (l.event_id, l.user_id,
          if (in) Some(best.get.event_id) else None,
          if (in) gap else None)
      }.sorted.toSeq
    def got(df: org.apache.spark.sql.DataFrame): Seq[Row4] =
      df.as[(Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq
    drawn(Gen.listOfN(70, tieEvGen), 905L, 6).foreach { batch =>
        val df = batch.toDF()
        assert(got(AsOfJoin.attribution(df, "purchase", "click", tol))
          === brute(batch, forward = false), "backward as-of diverged")
        assert(got(AsOfJoin.attributionForward(df, "purchase", "click", tol))
          === brute(batch, forward = true), "forward as-of diverged")
      }
  }

  test("both sessionize forms match a driver-side replay on tie-heavy batches") {
    import graft.ops.Sessionize
    val gap = 5L
    def brute(batch: List[Ev]): Map[Long, Long] =
      batch.groupBy(_.user_id).map { case (u, evs) =>
        val ts = evs.sortBy(e => (e.ts.getTime, e.event_id)).map(_.ts.getTime)
        u -> (1L + ts.zip(ts.tail).count { case (a, b) =>
          b / 1000 - a / 1000 > gap })
      }
    drawn(Gen.listOfN(70, tieEvGen), 1217L, 5).foreach { batch =>
        val df = batch.toDF()
        val want = brute(batch)
        val grouped = Sessionize.sessionsPerUser(spark, df, gap)
          .as[(Long, Long)].collect().toMap
        assert(grouped === want, "flatMapGroups form diverged")
        val secondary = Sessionize
          .sessionsPerUserSecondarySort(spark, df, gap)
          .as[(Long, Long)].collect().toMap
        assert(secondary === want, "secondary-sort form diverged")
      }
  }

  test("bucketed range join emits exactly the brute-force pair multiset") {
    import graft.ops.RangeJoin
    val win = 5L
    def brute(batch: List[Ev]): Seq[(Long, Long, Long, Long)] =
      (for {
        l <- batch if l.event_type == "purchase"
        r <- batch if r.event_type == "click" && r.user_id == l.user_id
        gap = floorSec(l.ts.getTime) - floorSec(r.ts.getTime)
        if gap >= 0 && gap <= win
      } yield (l.event_id, r.event_id, l.user_id, gap)).sorted
    drawn(Gen.listOfN(70, tieEvGen), 2331L, 5).foreach { batch =>
        // multiset compare (sorted seq, not set): the bucketed join's
        // exactly-once claim means a pair duplicated by the two-bucket
        // explode must FAIL, not collapse
        val got = RangeJoin
          .trailingWindowPairs(batch.toDF(), "purchase", "click", win)
          .as[(Long, Long, Long, Long)].collect().sorted.toSeq
        assert(got === brute(batch), "range-join pair multiset diverged")
      }
  }

  test("top-k per group matches a driver-side replay of the tie rules") {
    import graft.ops.Windows
    // unit values make every total an exact small integer (a float-sum
    // replay would hinge on summation order); the interesting seam is
    // the (desc total, asc user) tie-break, which collisions hit hard
    val k = 3
    def brute(batch: List[Ev]): Seq[(String, Long, Double, Int)] =
      batch.groupBy(e => (e.event_type, e.user_id)).toSeq
        .map { case ((t, u), es) => (t, u, es.size.toDouble) }
        .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(r => (-r._3, r._2)).zipWithIndex.take(k)
            .map { case ((t, u, v), i) => (t, u, v, i + 1) }
        }.sorted
    drawn(Gen.listOfN(70, tieEvGen), 3449L, 5).foreach { batch =>
        val got = Windows.topKPerGroup(batch.toDF(), k)
          .as[(String, Long, Double, Int)].collect().sorted.toSeq
        assert(got === brute(batch), "top-k per group diverged")
      }
  }

  /** Day-spread generator for the streaks replay (tieEvGen's 31-second
    * span never crosses a date line). */
  private val dayEvGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 40L)
    day <- Gen.choose(0L, 9L)
    secs <- Gen.choose(0L, 86399L)
    user <- Gen.choose(0L, 3L)
  } yield Ev(id, new Timestamp(1704067200000L + day * 86400000L + secs * 1000L),
    user, "click", 1.0)

  test("activity streaks match a driver-side gaps-and-islands replay") {
    import graft.ops.Sessionize
    def brute(batch: List[Ev]): Map[Long, (Long, Long, Long)] =
      batch.groupBy(_.user_id).map { case (u, evs) =>
        val days = evs.map(e =>
          Math.floorDiv(e.ts.getTime, 86400000L)).distinct.sorted
        val runs = days.foldLeft(List.empty[Long]) {
          case (len :: rest, d) if days.contains(d - 1) => (len + 1) :: rest
          case (acc, _) => 1L :: acc
        }
        u -> (days.size.toLong, runs.max, runs.size.toLong)
      }
    drawn(Gen.listOfN(50, dayEvGen), 4567L, 5).foreach { batch =>
        val got = Sessionize.activityStreaks(batch.toDF())
          .as[(Long, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
        assert(got === brute(batch), "streaks diverged")
      }
  }

  test("funnel matches a strictly-after replay on same-instant stage events") {
    import graft.ops.EventAnalytics
    val stages = Seq("view", "click", "purchase")
    def brute(batch: List[Ev]): Seq[Long] = {
      val byUser = batch.groupBy(_.user_id)
      stages.indices.map { k =>
        byUser.values.count { evs =>
          // fold stage by stage: earliest event of stage i strictly
          // after the reached time of stage i-1 (None = not reached)
          stages.take(k + 1).foldLeft(Option(Long.MinValue)) {
            (reached, st) => reached.flatMap { t =>
              val c = evs.filter(e => e.event_type == st && e.ts.getTime > t)
              if (c.isEmpty) None else Some(c.map(_.ts.getTime).min)
            }
          }.nonEmpty
        }.toLong
      }
    }
    drawn(Gen.listOfN(70, tieEvGen), 5881L, 5).foreach { batch =>
        val row = EventAnalytics.funnel(batch.toDF(), stages).head()
        val got = stages.indices.map(row.getLong)
        assert(got === brute(batch), "funnel counts diverged")
        assert(got === got.sorted.reverse, "funnel must be non-increasing")
      }
  }

  test("retention cohorts match a driver-side week replay") {
    import graft.ops.EventAnalytics
    val epochMs = 1704067200000L // 2024-01-01, UTC session tz
    def brute(batch: List[Ev]): Map[(Long, Long), Long] = {
      def week(e: Ev) =
        Math.floorDiv(Math.floorDiv(e.ts.getTime - epochMs, 86400000L), 7L)
      val cohort = batch.groupBy(_.user_id)
        .map { case (u, es) => u -> es.map(week).min }
      batch.map(e => (cohort(e.user_id), week(e) - cohort(e.user_id), e.user_id))
        .distinct.groupBy(t => (t._1, t._2))
        .map { case (k, v) => k -> v.size.toLong }
    }
    drawn(Gen.listOfN(50, dayEvGen), 6007L, 5).foreach { batch =>
        val got = EventAnalytics.retentionCohorts(batch.toDF(), "2024-01-01")
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got === brute(batch), "retention triangle diverged")
      }
  }

  test("hourly gap-fill matches a dense-spine replay with real zeros") {
    import graft.ops.EventAnalytics
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:00").withZone(java.time.ZoneOffset.UTC)
    def brute(batch: List[Ev]): Map[(String, String), Long] = {
      val counts = batch.groupBy(e =>
        (e.ts.getTime / 3600000L, e.event_type)).map { case (k, v) => k -> v.size.toLong }
      val hours = batch.map(_.ts.getTime / 3600000L)
      (for { hx <- hours.min to hours.max; t <- batch.map(_.event_type).distinct }
        yield (fmt.format(java.time.Instant.ofEpochMilli(hx * 3600000L)), t) ->
          counts.getOrElse((hx, t), 0L)).toMap
    }
    drawn(Gen.listOfN(35, hourEvGen), 18257L, 5).foreach { batch =>
      val got = EventAnalytics.gapfillHourly(batch.toDF())
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === brute(batch), "gap-filled series diverged")
    }
  }

  /** Sparse-hour generator for the interpolation replay: 35 events over
    * 41 hours × 2 types leaves plenty of gaps AND type-specific edge
    * cells (a type absent at the global spine's ends). Integer-valued
    * `value` keeps cents exact — no round() ambiguity in the replay. */
  private val hourEvGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 40L)
    h <- Gen.choose(0L, 40L)
    user <- Gen.choose(0L, 3L)
    typ <- Gen.oneOf("click", "view")
    v <- Gen.choose(0, 50)
  } yield Ev(id, new Timestamp(1704067200000L + h * 3600000L), user, typ,
    v.toDouble)

  test("hourly interpolation matches an integer replay incl. NULL edges") {
    import graft.ops.EventAnalytics
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:00").withZone(java.time.ZoneOffset.UTC)
    def brute(batch: List[Ev]): Map[(String, String), (Option[Long], Boolean)] = {
      val cents = batch.groupBy(e =>
          (e.ts.getTime / 3600000L, e.event_type))
        .map { case (k, es) => k -> es.map(e => (e.value * 100).toLong).sum }
      val hours = batch.map(_.ts.getTime / 3600000L)
      val types = batch.map(_.event_type).distinct
      (for {
        hx <- hours.min to hours.max; t <- types
      } yield {
        val key = (fmt.format(java.time.Instant.ofEpochMilli(hx * 3600000L)), t)
        cents.get((hx, t)) match {
          case Some(v) => key -> (Some(v), false)
          case None =>
            val prev = cents.keys.filter(k => k._2 == t && k._1 < hx)
              .map(_._1).maxOption
            val next = cents.keys.filter(k => k._2 == t && k._1 > hx)
              .map(_._1).minOption
            val interp = for { ph <- prev; nh <- next } yield
              (cents((ph, t)) * (nh - hx) + cents((nh, t)) * (hx - ph)) /
                (nh - ph)
            key -> (interp, true)
        }
      }).toMap
    }
    drawn(Gen.listOfN(35, hourEvGen), 7129L, 5).foreach { batch =>
        val got = EventAnalytics.interpolateHourly(batch.toDF())
          .as[(String, String, Option[Long], Boolean)].collect()
          .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
        assert(got === brute(batch), "interpolation series diverged")
      }
  }

  test("sequence packing matches the greedy first-fit replay exactly") {
    import graft.ext.PackOps
    val mix = 2654435761L
    val (budget, shards) = (40, 3)
    def brute(docs: Seq[(Long, Int)]): Map[Long, (Long, Long)] =
      docs.map { case (id, n) =>
        (id, java.lang.Math.floorMod(id * mix, shards.toLong), n.toLong)
      }.groupBy(_._2).flatMap { case (sh, rows) =>
        var seq = 0L; var acc = 0L
        rows.sortBy(_._1).map { case (id, _, n) =>
          if (acc > 0 && acc + n > budget) { seq += 1; acc = 0L }
          acc += n
          id -> (sh, seq)
        }
      }
    val docGen = Gen.choose(1, 60) // token counts incl. oversized (> budget)
    drawn(Gen.listOfN(50, docGen), 8191L, 5)
      .map(_.zipWithIndex.map { case (n, i) => (i.toLong, n) })
      .foreach { docs =>
        val df = docs.map { case (id, n) =>
          (id, (1 to n).map(_ => "w").mkString(" ")) }.toDF("doc_id", "text")
        val got = PackOps.packSequences(df, budget, shards)
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        assert(got === brute(docs), "packing assignment diverged")
      }
  }

  /** Ten users over 24 distinct hours-of-day — dense enough that cosine
    * ties and shared-hour sparsity both occur. */
  private val profileEvGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 200L)
    h <- Gen.choose(0L, 23L)
    user <- Gen.choose(0L, 9L)
  } yield Ev(id, new Timestamp(1704067200000L + h * 3600000L), user, "click", 1.0)

  test("profile top-k matches an integer-dot cosine replay with its tie order") {
    import graft.ops.EventAnalytics
    def brute(batch: List[Ev], k: Int): Seq[(Long, Double)] = {
      val counts = batch.groupBy(e => (e.user_id, e.ts.getTime / 3600000L % 24))
        .map { case (key, es) => key -> es.size.toLong }
      val qu = batch.map(_.user_id).min
      val qn = counts.collect { case ((u, h), n) if u == qu => h -> n }
      val q2 = qn.values.map(n => n * n).sum
      counts.keys.map(_._1).filter(_ != qu).toSeq.distinct.flatMap { u =>
        val dot = qn.map { case (h, n) => counts.getOrElse((u, h), 0L) * n }.sum
        // users sharing no hour with the query user never enter the
        // dots join — they are absent, not zero-scored
        if (dot == 0) None
        else {
          val n2 = counts.collect { case ((`u`, _), n) => n * n }.sum
          Some(u -> halfUp(dot / math.sqrt(n2.toDouble * q2), 6))
        }
      }.sortBy { case (u, c) => (-c, u) }.take(k)
    }
    drawn(Gen.listOfN(80, profileEvGen), 9277L, 5).foreach { batch =>
        val got = EventAnalytics.profileTopK(batch.toDF(), 5)
          .as[(Long, Double)].collect().toSeq
        assert(got === brute(batch, 5), "profile top-k diverged")
      }
  }

  test("trailing actives match a window-membership replay on observed days") {
    import graft.ops.EventAnalytics
    def brute(batch: List[Ev], w: Int): Map[Long, Long] = {
      val userDays = batch.map(e =>
        (e.user_id, Math.floorDiv(e.ts.getTime - 1704067200000L, 86400000L)))
        .distinct
      val days = userDays.map(_._2).distinct
      days.map { wd =>
        wd -> userDays.collect {
          case (u, d) if d <= wd && d > wd - w => u
        }.distinct.size.toLong
      }.toMap
    }
    drawn(Gen.listOfN(50, dayEvGen), 10501L, 5).foreach { batch =>
        val got = EventAnalytics.trailingActiveUsers(batch.toDF(), 7)
          .as[(Long, Long)].collect().toMap
        assert(got === brute(batch, 7), "trailing actives diverged")
      }
  }

  test("mix rebalance and temperature mix keep exactly the replayed members") {
    import graft.ext.SampleOps
    val mix = 2654435761L
    val P = 1000000007L
    def rank(keys: Seq[Long], take: Long): Set[Long] =
      keys.sortBy(k => (java.lang.Math.floorMod(k * mix, P), k))
        .take(take.toInt).toSet
    // skewed groups: one dominant language plus a tail
    val docGen = Gen.frequency(
      6 -> Gen.const("en"), 2 -> Gen.const("fr"),
      1 -> Gen.const("de"), 1 -> Gen.const("sw"))
    drawn(Gen.listOfN(60, docGen), 11813L, 5)
      .map(_.zipWithIndex.map { case (g, i) => (i.toLong, g) })
      .foreach { docs =>
        val byG = docs.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1) }
        val df = docs.toDF("doc_id", "lang")
        // rebalance: cap = floor(mean group size), smallest keyed hashes
        val cap = math.floor(
          byG.values.map(_.size).sum.toDouble / byG.size).toLong
        val wantReb = byG.flatMap { case (_, ks) => rank(ks, cap) }.toSet
        val gotReb = SampleOps.rebalanceToMeanShare(df, "lang", "doc_id")
          .select("doc_id").as[Long].collect().toSet
        assert(gotReb === wantReb, "rebalance membership diverged")
        // temperature: target = min(n_g, ((n_total div 2) * floor(sqrt n_g)) div SUM w)
        val sw = byG.values.map(ks => math.sqrt(ks.size.toDouble).toLong).sum
        val half = docs.size.toLong / 2
        val wantTmp = byG.flatMap { case (_, ks) =>
          val w = math.sqrt(ks.size.toDouble).toLong
          rank(ks, math.min(ks.size.toLong, half * w / sw))
        }.toSet
        val gotTmp = SampleOps.temperatureMix(df, "lang", "doc_id")
          .select("doc_id").as[Long].collect().toSet
        assert(gotTmp === wantTmp, "temperature-mix membership diverged")
      }
  }

  test("transition matrix matches an exact replay of counts and lift") {
    import graft.ops.EventAnalytics
    def brute(batch: List[Ev]): Map[(String, String), (Long, Double)] = {
      val trans = batch.groupBy(_.user_id).values.toSeq.flatMap { evs =>
        val s = evs.sortBy(e => (e.ts.getTime, e.event_id)).map(_.event_type)
        s.zip(s.tail)
      }
      val n = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val total = trans.size.toLong
      val nFrom = n.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
      val nTo = n.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
      n.map { case ((f, t), c) =>
        (f, t) -> (c, halfUp(
          c.toDouble * total / (nFrom(f).toDouble * nTo(t)), 4)) }
    }
    // two events sharing a user's ENTIRE (ts, event_id) sort key but
    // differing in type would leave the successor order unspecified in
    // engine and replay alike — collapse those (and only those) so the
    // replay compares a well-defined sequence; ts and id collisions
    // that keep the key distinct remain, which is the seam under test
    drawn(Gen.listOfN(70, tieEvGen), 13499L, 5)
      .map(_.distinctBy(e => (e.user_id, e.ts.getTime, e.event_id)))
      .foreach { batch =>
        val got = EventAnalytics.transitionMatrix(batch.toDF())
          .as[(String, String, Long, Double)].collect()
          .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
        assert(got === brute(batch), "transition matrix diverged")
      }
  }

  /** Varied-value generator for the winsorized replay: quarter-step
    * doubles force fractional percentile interpolation positions. */
  private val valEvGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 500L)
    secs <- Gen.choose(0L, 600L)
    user <- Gen.choose(0L, 9L)
    typ <- Gen.oneOf("click", "view", "purchase")
    q <- Gen.choose(0, 400)
  } yield Ev(id, new Timestamp(1704067200000L + secs * 1000L), user, typ, q / 4.0)

  test("winsorized stats match a replay of Spark's interpolated percentile") {
    import graft.ops.Aggregates
    // Spark's exact percentile: pos = p·(n−1) over the sorted values,
    // linear interpolation between the straddling ranks
    def pct(sorted: Vector[Double], p: Double): Double = {
      val pos = p * (sorted.size - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
    }
    def brute(batch: List[Ev]): Map[String, (Long, Long, Long, Double, Double, Long)] =
      batch.groupBy(_.event_type).map { case (t, es) =>
        val vs = es.map(_.value)
        val sorted = vs.sorted.toVector
        val (p05, p95) = (pct(sorted, 0.05), pct(sorted, 0.95))
        val win = vs.map(v => math.min(math.max(v, p05), p95))
        t -> (vs.size.toLong,
          vs.count(_ < p05).toLong, vs.count(_ > p95).toLong,
          halfUp(p05, 4), halfUp(p95, 4),
          win.map(w => halfUp(w * 1000000, 0).toLong).sum)
      }
    drawn(Gen.listOfN(80, valEvGen), 15091L, 5).foreach { batch =>
        val got = Aggregates.winsorizedStats(batch.toDF())
          .as[(String, Long, Long, Long, Double, Double, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7)).toMap
        assert(got === brute(batch), "winsorized stats diverged")
      }
  }

  test("ntile, relative ranks, and the range moving average match replays") {
    import graft.ops.Windows
    // quarter-step values make every sum/avg a dyadic rational — exact
    // in double under ANY summation order, so the replays are stable
    // unique event_ids: the ntile/order tie-breaks assume a unique key
    drawn(Gen.listOfN(80, valEvGen), 16127L, 5)
      .map(_.zipWithIndex.map { case (e, i) => e.copy(event_id = i.toLong) })
      .foreach { batch =>
        val df = batch.toDF()
        // ntile(10) over (desc value, asc id): first n%10 buckets carry
        // the extra row — Spark's exact distribution, replayed literally
        val wantN = batch.groupBy(_.event_type).toSeq.flatMap { case (t, es) =>
          val sorted = es.sortBy(e => (-e.value, e.event_id))
          val (base, rem) = (sorted.size / 10, sorted.size % 10)
          val buckets = (1 to 10).flatMap(b =>
            Seq.fill(if (b <= rem) base + 1 else base)(b))
          sorted.zip(buckets).groupBy(_._2).map { case (d, rows) =>
            (t, d, rows.size.toLong,
              halfUp(rows.map(_._1.value).min, 2),
              halfUp(rows.map(_._1.value).max, 2)) }
        }.sorted
        val gotN = Windows.ntileDeciles(df)
          .as[(String, Int, Long, Double, Double)].collect().sorted.toSeq
        assert(gotN === wantN, "ntile deciles diverged")
        // percent_rank = pos/(n-1), cume_dist = (pos+1)/n over the unique
        // (spend, user) order — spends are exact dyadic sums
        val spends = batch.groupBy(_.user_id)
          .map { case (u, es) => (u, halfUp(es.map(_.value).sum, 2)) }.toSeq
          .sortBy { case (u, s) => (s, u) }
        val n = spends.size
        val wantR = spends.zipWithIndex.map { case ((u, s), i) =>
          (u, s, if (n == 1) 0.0 else halfUp(i.toDouble / (n - 1), 6),
            halfUp((i + 1).toDouble / n, 6)) }.sortBy(_._1)
        val gotR = Windows.relativeSpendRank(df)
          .as[(Long, Double, Double, Double)].collect().toSeq
        assert(gotR === wantR, "relative ranks diverged")
        // trailing 60 s range frame: rows sharing a second are peers
        val wantM = batch.map { l =>
          val t = Math.floorDiv(l.ts.getTime, 1000L)
          val win = batch.filter(e => e.user_id == l.user_id && {
            val s = Math.floorDiv(e.ts.getTime, 1000L)
            s >= t - 60 && s <= t })
          (l.event_id, l.user_id,
            halfUp(win.map(_.value).sum / win.size, 4))
        }.sorted
        val gotM = Windows.movingAvgTrailing(df, 60L)
          .as[(Long, Long, Double)].collect().sorted.toSeq
        assert(gotM === wantM, "range moving average diverged")
      }
  }

  test("lag/lead neighbors match a positional replay on tie-heavy batches") {
    def brute(batch: List[Ev]): Seq[(Long, Long, Option[Long], Option[Long], Option[Long])] =
      batch.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
        val s = evs.sortBy(e => (e.ts.getTime, e.event_id))
        s.indices.map { i =>
          val prev = if (i > 0) Some(s(i - 1)) else None
          val next = if (i < s.size - 1) Some(s(i + 1)) else None
          (s(i).event_id, u, prev.map(_.event_id), next.map(_.event_id),
            prev.map(p => floorSec(s(i).ts.getTime) - floorSec(p.ts.getTime)))
        }
      }.sorted
    drawn(Gen.listOfN(70, tieEvGen), 17393L, 5).foreach { batch =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val got = batch.toDF().select(
            col("event_id"), col("user_id"),
            lag("event_id", 1).over(w).as("p"),
            lead("event_id", 1).over(w).as("nx"),
            (unix_timestamp(col("ts")) -
              unix_timestamp(lag("ts", 1).over(w))).as("g"))
          .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
          .collect().sorted.toSeq
        // full-sort-key duplicates are interchangeable: the row-value
        // MULTISET is deterministic even where row identity is not
        assert(got === brute(batch), "lag/lead neighbors diverged")
      }
  }
}
