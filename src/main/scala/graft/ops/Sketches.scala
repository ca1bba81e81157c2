package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch aggregations — the 100 TB rollup pattern.
  *
  * At cluster scale you never re-scan raw data to answer "distinct users
  * last month": each partition (day, shard) keeps a tiny mergeable sketch
  * and any rollup is a union of sketches. The reference's dashboard keeps
  * running tallies over the votes stream
  * (`/root/reference/Note_Projet1_RealTimeVotingDataEngineer.txt:34-37`);
  * these are the same tallies in their scale-out form:
  *
  *  - Apache DataSketches HLL (`hll_sketch_agg` / `hll_union_agg` /
  *    `hll_sketch_estimate`, native Spark 3.5+ aggregates): per-(group,
  *    day) sketches of a few KB, unioned per group — associative and
  *    commutative, so the merge tree can follow any partitioning.
  *  - Count-min sketch (`count_min_sketch` aggregate): fixed-width
  *    (eps, confidence) counter matrix, merged map-side; point lookups
  *    overestimate by at most eps·N with the configured confidence.
  *
  * Grading follows the repo's differential sketch contract (a6/a7/a10):
  * the oracle recomputes the EXACT answer plus `true` verdict columns;
  * the engine computes the exact answer the same way and derives each
  * verdict honestly from the sketch — a sketch regression flips the
  * boolean and the hash goes red.
  */
object Sketches {

  /** Distinct users per event type, answered three ways: exactly, by one
    * global HLL sketch per type, and by a union of per-day HLL sketches
    * (the partitioned layout a 100 TB table would store). Verdicts:
    * the merged estimate lands within 5% of exact, and daily-merge vs
    * global sketch agree within 1% (associativity of the union).
    *
    * Shuffle shape: the daily leg exchanges one ~KB sketch per
    * (event_type, day) — map-side partial `hll_sketch_agg` does the heavy
    * lifting; the raw rows never shuffle. */
  def hllMergeDistinct(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = daily
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
    val global = events
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est_global"),
           countDistinct(col("user_id")).as("n_users_exact"))
    global.join(merged, Seq("event_type"))
      .select(
        col("event_type"),
        col("n_users_exact"),
        (abs(col("est_merged") - col("n_users_exact")) <=
          col("n_users_exact") * 0.05).as("merged_within_5pct"),
        (abs(col("est_merged") - col("est_global")) <=
          greatest(col("est_global") * 0.01, lit(1.0)))
          .as("merge_vs_global_within_1pct"))
  }

  /** Audience-overlap estimation from HLL sketches via inclusion–
    * exclusion: `|A∩B| ≈ est(A) + est(B) − est(A∪B)` — the analytics
    * ask ("how many users did BOTH X and Y?") that exact machinery
    * answers only by re-shuffling the raw user sets, while sketches
    * answer it from three ~KB summaries that can live precomputed per
    * segment. The union estimate comes from `hll_union_agg` of the two
    * per-type sketches — no raw-row re-scan. Graded on the differential
    * sketch contract: exact audience sizes (replayed by the oracle) +
    * honest tolerance verdicts (5% per side/union; 10% for the
    * intersection, whose IE error compounds all three estimates).
    *
    * Scale shape: one map-side-combined sketch pass over the filtered
    * types plus one exact per-user flag fold for the truth columns (at
    * 100 TB you'd drop the truth leg and keep only the sketches). */
  def hllOverlap(events: DataFrame, typeA: String, typeB: String): DataFrame = {
    val two = events.filter(col("event_type").isin(typeA, typeB))
      .select("event_type", "user_id")
    val sk = two.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val ests = sk
      .withColumn("est", expr("hll_sketch_estimate(sk)"))
      .agg(
        max(when(col("event_type") === typeA, col("est"))).as("est_a"),
        max(when(col("event_type") === typeB, col("est"))).as("est_b"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_union"))
    val exact = two.groupBy("user_id")
      .agg(
        max(when(col("event_type") === typeA, 1).otherwise(0)).as("ia"),
        max(when(col("event_type") === typeB, 1).otherwise(0)).as("ib"))
      .agg(sum("ia").cast("long").as("n_a"),
           sum("ib").cast("long").as("n_b"),
           sum(col("ia") * col("ib")).cast("long").as("n_inter"))
    exact.crossJoin(ests)
      .select(
        col("n_a"), col("n_b"), col("n_inter"),
        (abs(col("est_a") - col("n_a")) <= col("n_a") * 0.05)
          .as("a_within_5pct"),
        (abs(col("est_b") - col("n_b")) <= col("n_b") * 0.05)
          .as("b_within_5pct"),
        (abs(col("est_union") - (col("n_a") + col("n_b") - col("n_inter")))
          <= (col("n_a") + col("n_b") - col("n_inter")) * 0.05)
          .as("union_within_5pct"),
        (abs(col("est_a") + col("est_b") - col("est_union") - col("n_inter"))
          <= greatest(col("n_inter") * 0.10, lit(2.0)))
          .as("inter_within_10pct"))
  }

  /** Trailing-`windowDays` distinct actives answered from MERGED per-day
    * HLL sketches — the sketch form of [[graft.ops.EventAnalytics
    * .trailingActiveUsers]]. The raw rows are touched ONCE (one exchange
    * of per-day ~KB sketches); every trailing window is then a union of
    * `windowDays` day sketches, never a re-scan, and the window fan-out
    * explodes days×windowDays SKETCHES (KB each, ~days rows total) where
    * the exact form explodes users×days rows. At 100 TB that is the
    * difference between a dashboard refresh touching a few MB of sketch
    * partials and re-shuffling the deduped user-day set per refresh.
    * Graded on the differential sketch contract: the exact trailing
    * count (same derivation the oracle replays) plus an honest within-5%
    * verdict from the merged estimates. */
  def trailingActiveSketch(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val daily = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
      .groupBy("day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val spine = daily.select(col("day").as("win_day"))
    val est = daily
      .select(col("sk"), explode(sequence(col("day"),
        col("day") + lit(windowDays - 1))).as("win_day"))
      .join(spine, Seq("win_day"), "left_semi")
      .groupBy("win_day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    EventAnalytics.trailingActiveUsers(events, windowDays)
      .join(est, Seq("win_day"))
      .select(col("win_day"), col("n_active"),
        (abs(col("est") - col("n_active")) <= col("n_active") * 0.05)
          .as("sketch_within_5pct"))
      .orderBy("win_day")
  }

  /** Percentiles from MERGED per-day quantile sketches — the rollup the
    * other two sketch seats prove for distincts (HLL) and point counts
    * (CMS), here for p50/p90/p99: each (event_type, day) folds its
    * values into a KB-sized Greenwald–Khanna summary
    * ([[graft.functions.QuantileSketchAgg]], the same `QuantileSummaries`
    * machinery behind `percentile_approx`, exposed as a storable value),
    * and the per-type answer is queried from the UNION of day sketches
    * ([[graft.functions.QuantileMergeAgg]]) — raw rows shuffle never,
    * history is never re-scanned.
    *
    * Grading (differential sketch contract): the merged estimate's
    * guarantee is on RANK — the returned value's true rank r must
    * satisfy |r − p·n| ≤ ε·n (+1 boundary slack). The engine verifies
    * that honestly with one broadcast join back over the raw values
    * (types×probs rows broadcast; one count pass); the oracle
    * recomputes the exact n per type and expects every verdict true. */
  def quantileRollup(events: DataFrame, relativeError: Double = 0.001,
                     probs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val sketch = udaf(new graft.functions.QuantileSketchAgg(relativeError),
      Encoders.scalaDouble)
    val merge = udaf(
      new graft.functions.QuantileMergeAgg(relativeError, probs),
      Encoders.BINARY)
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sketch(col("value")).as("sk"))
    val merged = daily
      .groupBy("event_type")
      .agg(merge(col("sk")).as("qs"))
    val probed = merged.select(col("event_type"),
        posexplode(col("qs")).as(Seq("pi", "approx")))
      .withColumn("p",
        element_at(typedLit(probs.toArray), col("pi") + 1))
      .select("event_type", "p", "approx")
    events.select(col("event_type"), col("value"))
      .join(broadcast(probed), Seq("event_type"))
      .groupBy("event_type", "p", "approx")
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("value") <= col("approx"), 1L).otherwise(0L))
             .as("rank_le"))
      .select(col("event_type"), col("p"), col("n_rows"),
        (abs(col("rank_le") - col("p") * col("n_rows")) <=
          col("n_rows") * relativeError + 1).as("rank_ok"))
      .orderBy("event_type", "p")
  }

  /** Heavy-hitter point counts by count-min sketch over the skewed key
    * space a10 grades (user_id % 5 < 2 → key 7, = 2 → key 13, else a
    * ~1000-key tail). The sketch is built by the DISTRIBUTED
    * `count_min_sketch` aggregate (partials merge map-side; one
    * eps×confidence matrix crosses the wire per partition); only the
    * finished ~KB sketch reaches the driver, which probes the exact
    * top-k keys — k-bounded driver work, same as the Lloyd centroids.
    *
    * Output per probed key: exact count and the CMS guarantee verdict
    * (estimate never undercounts; overcounts by at most ceil(eps·N)). */
  def cmsHeavyHitters(events: DataFrame, eps: Double = 0.005,
                      confidence: Double = 0.99, topK: Int = 5): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(
      when(col("user_id") % 5 < 2, lit(7L))
        .when(col("user_id") % 5 === 2, lit(13L))
        .otherwise(col("user_id") % 1000).as("hot_key"))
    val exact = keyed.groupBy("hot_key").agg(count(lit(1)).as("n_exact"))
      .orderBy(desc("n_exact"), asc("hot_key")).limit(topK)
      .collect() // k-bounded: topK rows
    val row = keyed.agg(
      expr(s"count_min_sketch(hot_key, ${eps}d, ${confidence}d, 42)").as("sk"),
      count(lit(1)).as("n_total")).head()
    val cms = CountMinSketch.readFrom(row.getAs[Array[Byte]]("sk"))
    val nTotal = row.getAs[Long]("n_total")
    val bound = math.ceil(eps * nTotal).toLong
    val verdicts = exact.toSeq.map { r =>
      val k = r.getAs[Long]("hot_key")
      val n = r.getAs[Long]("n_exact")
      val est = cms.estimateCount(k)
      (k, n, est >= n && est <= n + bound)
    }
    verdicts.toDF("hot_key", "n_exact", "cms_within_bound")
  }
}
