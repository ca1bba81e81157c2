package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` stream-at-rest: ordered
  * funnels, cohort retention, and time-series gap-filling — the query
  * family the reference's event pipeline feeds downstream (its dashboard
  * consumer, `Note_Projet1_...txt:34-36`, is exactly this seat).
  *
  * Scale contract: every per-user computation shuffles ONCE on user_id
  * and later stages reuse that partitioning (the per-user aggregates
  * arrive at each join already hash-distributed); the gap-fill spine is
  * hours × types — thousands of rows regardless of fact size — so it
  * broadcasts, never the fact side.
  */
object EventAnalytics {

  /** Ordered funnel: users whose first `stages(k)` event happens strictly
    * after their qualifying `stages(k-1)` event, stage by stage. One row,
    * one `n_<stage>` column per stage (each necessarily ≤ the previous).
    *
    * Each stage is a filter + per-user min — the correlated "first X
    * after the user's Y" subquery decorrelated into an equi join on
    * user_id with the strict-inequality residual riding it (same
    * decorrelation family as the q4/q17 shapes, applied per stage).
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages)
    var prev: Option[DataFrame] = None
    val counts = stages.map { st =>
      val filtered = events.filter(col("event_type") === st)
        .select(col("user_id"), col("ts"))
      val reached = prev match {
        case None =>
          filtered.groupBy("user_id").agg(min("ts").as("t"))
        case Some(p) =>
          filtered.join(
              p.select(col("user_id").as("pu"), col("t").as("pt")),
              col("user_id") === col("pu") && col("ts") > col("pt"))
            .groupBy("user_id").agg(min("ts").as("t"))
      }
      prev = Some(reached)
      reached.agg(count(lit(1)).as(s"n_$st"))
    }
    // 1-row × 1-row cross joins: a width-fold, not a real product
    counts.reduce(_.crossJoin(_))
  }

  private def weekSince(epoch: String)(c: Column): Column =
    floor(datediff(c.cast("date"), lit(epoch).cast("date")) / 7).cast("long")

  /** Cohort retention triangle: cohort = the week (since `epoch`) of the
    * user's first event; for each (cohort, week-offset) the number of
    * distinct cohort members active that week. Integer day arithmetic —
    * no ISO-week builtin whose year-boundary rules differ per engine.
    */
  def retentionCohorts(events: DataFrame, epoch: String): DataFrame = {
    val firstWeek = events.groupBy(col("user_id").as("fu"))
      .agg(weekSince(epoch)(min("ts")).as("cohort_week"))
    events.select(col("user_id"), weekSince(epoch)(col("ts")).as("w"))
      .join(firstWeek, col("user_id") === col("fu"))
      .groupBy(col("cohort_week"),
               (col("w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Fixed-width downsampling to OHLC bars — the metrics/financial
    * resample: per (event_type, epoch-aligned `barSeconds` bucket) the
    * first/last value by event time (open/close), the extrema (low/high),
    * the row count and value sum. One groupBy with map-side-combinable
    * aggregates — `min_by`/`max_by` fold (value, key) pairs, so the
    * shuffle carries six scalars per bar, never the bar's rows (contrast
    * a per-bar window sort). Event times are unique in this dataset at
    * every SF, so the min_by/max_by keys are total and the result is
    * engine-independent; with tie-able keys the key would extend to
    * (ts, event_id). */
  def ohlcBars(events: DataFrame, barSeconds: Int = 900): DataFrame =
    events.select(col("event_type"), col("ts"), col("value"))
      .groupBy(col("event_type"),
        window(col("ts"), s"$barSeconds seconds").getField("start").as("bar"))
      .agg(
        round(min_by(col("value"), col("ts")), 2).as("open"),
        round(max("value"), 2).as("high"),
        round(min("value"), 2).as("low"),
        round(max_by(col("value"), col("ts")), 2).as("close"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("volume"))
      .select(col("event_type"),
        date_format(col("bar"), "yyyy-MM-dd HH:mm").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("volume"))
      .orderBy("event_type", "bar_start")

  /** Hierarchical OHLC rollup — 1-hour bars REAGGREGATED from 15-minute
    * bars, never from raw ticks: the incremental time-series maintenance
    * pattern (at 100 TB the fine bars are the stored materialization and
    * every coarser resolution folds from them; the tick table is touched
    * once, ever). OHLC is mergeable by construction: coarse open = open
    * of the earliest non-empty fine bar, close mirrors, high/low are
    * max/min of fine highs/lows, counts and volumes add — and volume is
    * carried in integer cents so the two-level sum is exactly the direct
    * sum. Rounding happens once, at the coarse level, so every emitted
    * value is bit-identical to the direct-from-ticks computation the
    * oracle runs. */
  def ohlcRollup(events: DataFrame, fineSeconds: Int = 900): DataFrame = {
    // a fine bar that straddled an hour boundary would be assigned
    // wholesale to its START's hour by the date_trunc below, silently
    // breaking the bit-identical-to-direct invariant — only divisors
    // of the coarse bar width are mergeable
    require(fineSeconds > 0 && 3600 % fineSeconds == 0,
      s"fineSeconds must divide 3600, got $fineSeconds")
    val fine = events
      .select(col("event_type"), col("ts"), col("value"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"),
        window(col("ts"), s"$fineSeconds seconds")
          .getField("start").as("fbar"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n"),
        sum("cents").as("vol_cents"))
    fine
      .groupBy(col("event_type"), date_trunc("hour", col("fbar")).as("bar"))
      .agg(
        round(min_by(col("open"), col("fbar")), 2).as("open"),
        round(max("high"), 2).as("high"),
        round(min("low"), 2).as("low"),
        round(max_by(col("close"), col("fbar")), 2).as("close"),
        sum("n").as("n_events"),
        sum("vol_cents").as("vol_cents"))
      .select(col("event_type"),
        date_format(col("bar"), "yyyy-MM-dd HH:mm").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("vol_cents"))
  }

  /** Anomaly flags over the hourly count series: an hour is anomalous
    * when its count DEVIATES from the trailing-24h mean by more than
    * `sigmas` sample standard deviations — two-sided, so outage dips
    * flag alongside spikes (the squared form below is exactly the
    * |deviation| test; the oracle replays the same two-sided predicate).
    * The entire test is INTEGER arithmetic:
    * with s = Σn, sq = Σn², c = window size over the trailing frame,
    *
    *   (n − s/c)² > σ²·(sq − s²/c)/(c−1)
    *   ⟺ (n·c − s)²·(c−1) > σ²·c·(sq·c − s²)   [× c²(c−1), c ≥ 2]
    *
    * so no division, no sqrt, no float — the flag is bit-identical across
    * engines (a stddev_samp-based form would hinge on each engine's
    * variance recursion agreeing to the last ulp). Computed in
    * decimal(38,0): counts are exact integers, and the cross-multiplied
    * terms stay exact far past long range. The trailing RANGE frame
    * excludes the current hour (no self-masking); hours with fewer than
    * 2 trailing observations can't be judged and emit flag = false. */
  def anomalyFlags(events: DataFrame, sigmas: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
      .withColumn("hs", col("hour").cast("long"))
    val w = Window.partitionBy("event_type").orderBy(col("hs"))
      .rangeBetween(-24L * 3600, -1)
    val d = "decimal(38,0)"
    hourly
      .withColumn("c", count(lit(1)).over(w))
      .withColumn("s", sum("n").over(w))
      .withColumn("sq", sum(col("n") * col("n")).over(w))
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
        col("n"),
        (col("c") >= 2 &&
          (col("n").cast(d) * col("c") - col("s"))
            * (col("n").cast(d) * col("c") - col("s")) * (col("c") - 1)
          > lit(sigmas * sigmas).cast(d) * col("c")
            * (col("sq").cast(d) * col("c") - col("s").cast(d) * col("s")))
          .as("is_anomaly"))
      .orderBy("event_type", "hour")
  }

  /** Hourly counts per event type with the gaps zero-filled over the
    * observed [min, max] hour span. The spine (sequence of hours ×
    * distinct types) derives from two tiny aggregates; the left join
    * keeps it on the build side — at scale the hourly AGGREGATE is what
    * joins, never raw events.
    */
  def gapfillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
    val spine = events
      .agg(date_trunc("hour", min("ts")).as("h0"),
           date_trunc("hour", max("ts")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("hour"))
      .crossJoin(events.select("event_type").distinct())
    spine.join(hourly, Seq("hour", "event_type"), "left_outer")
      .select(date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
              col("event_type"),
              coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour", "event_type")
  }

  /** Linear interpolation over the hourly (event_type, hour) series —
    * where [[gapfillHourly]] zero-fills a missing cell, this fills it on
    * the line between its nearest observed neighbors. The interpolation
    * is exact integer arithmetic: with the series in value-cents, a gap
    * cell at offset k of a g-hour gap gets `(prev·(g−k) + next·k) div g`
    * — every term non-negative, so truncating division agrees between
    * engines (no float, no negative-division semantics).
    *
    * Edge semantics: the spine spans the GLOBAL [min, max] hour range
    * across all types, so a spine cell before a type's first
    * observation (or after its last) has no neighbor on one side —
    * interpolation is undefined there and `v_cents` is NULL with
    * `interpolated = true`; consumers that want extrapolation must
    * choose their own edge rule (hold-nearest, zero, drop). The oracle
    * replays the identical NULL-edge semantics.
    *
    * Scale shape: the window runs over the AGGREGATED hours × types
    * series (the facts fold map-side first), partitioned by event_type;
    * `last(_, ignoreNulls)` / `first(_, ignoreNulls)` carry the
    * neighbors — one pass each direction, never a per-gap self-join. */
  def interpolateHourly(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("hour", "event_type").agg(sum("cents").as("v"))
    val spine = events
      .agg(date_trunc("hour", min("ts")).as("h0"),
           date_trunc("hour", max("ts")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("hour"))
      .crossJoin(events.select("event_type").distinct())
    val series = spine.join(hourly, Seq("hour", "event_type"), "left_outer")
      .withColumn("hx", expr("unix_timestamp(hour) div 3600"))
    val back = Window.partitionBy("event_type").orderBy("hx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("hx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    series
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("ph", last(when(col("v").isNotNull, col("hx")),
        ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(when(col("v").isNotNull, col("hx")),
        ignoreNulls = true).over(fwd))
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"),
        coalesce(col("v"),
          expr("(pv * (nh - hx) + nv * (hx - ph)) div (nh - ph)"))
          .as("v_cents"),
        col("v").isNull.as("interpolated"))
  }

  /** Time-series similarity search (the distributed top-k
    * profile-similarity shape of "Time Series Similarity Search for
    * Streaming Data in Distributed Systems", EDBT 2019): find the k users
    * whose hour-of-day activity profile is most cosine-similar to a query
    * user's. Profiles are SPARSE (user, hour, count) rows — the dot
    * product is an equi-join on the hour key (missing hours contribute
    * 0), so the computation is Σ nnz, never users × 24 dense vectors; at
    * 100 TB the query profile (≤ 24 rows) broadcasts and the fact table
    * folds map-side into the per-(user, hour) counts first. Dot and both
    * norms stay exact integers; the only float is the final
    * one-expression cosine, rounded identically on both engines. */
  def profileTopK(events: DataFrame, k: Int = 10): DataFrame = {
    val c = events
      .groupBy(col("user_id"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val qu = events.agg(min("user_id").as("qu"))
    val cq = c.join(broadcast(qu), col("user_id") === col("qu"))
      .select(col("h"), col("n").as("qn"))
    val q2 = cq.agg(sum(col("qn") * col("qn")).as("q2"))
    val dots = c.join(broadcast(cq), Seq("h"))
      .groupBy("user_id").agg(sum(col("n") * col("qn")).as("dot"))
    val norms = c.groupBy("user_id").agg(sum(col("n") * col("n")).as("n2"))
    dots.join(norms, Seq("user_id"))
      .crossJoin(broadcast(q2)).crossJoin(broadcast(qu))
      .filter(col("user_id") =!= col("qu"))
      .select(col("user_id").as("other_user"),
        expr("round(dot / sqrt(cast(n2 as double) * q2), 6)").as("cosine"))
      .orderBy(desc("cosine"), asc("other_user"))
      .limit(k)
  }

  /** Trailing-N-day distinct active users per observed day (the "7-day
    * actives" metric). The naive form — a per-day correlated
    * count(DISTINCT) over a trailing self-join of the FACT table — is
    * O(days · events). The scalable rewrite: dedup to (user, day) first
    * (the only exchange over data), then each (user, day) contributes to
    * exactly `windowDays` window-days via a bounded `explode(sequence)`,
    * and the final countDistinct groups by window-day. Explode factor is
    * the constant `windowDays` over the ALREADY-DEDUPED set — at 100 TB
    * the fact table is touched once, and everything after is
    * users×days-sized. Only window-days that actually occur in the data
    * are emitted (spine semi-join), mirroring the oracle's spine. */
  def trailingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val userDays = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
      .distinct()
    val spine = userDays.select(col("day").as("win_day")).distinct()
    userDays
      .select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + lit(windowDays - 1))).as("win_day"))
      .join(spine, Seq("win_day"), "left_semi")
      .groupBy("win_day")
      .agg(countDistinct("user_id").as("n_active"))
  }

  /** Behavioral transition matrix: for every consecutive event pair in a
    * user's timeline (ordered (ts, event_id)), count (from → to)
    * transitions and score each against independence —
    * `lift = n_trans · n_total / (n_from · n_to)` — the Markov-chain
    * view of user paths that funnels (fixed stage order) can't express.
    *
    * Scale shape: ONE shuffle on user_id feeds the `lead` window; the
    * pair counts that leave it are |types|² rows (25 here), so the
    * marginal sums and lift run on a handful of rows via two tiny
    * window folds — the 100 TB input never moves twice. Lift multiplies
    * in double (long·long would overflow past ~3e9 transitions); the
    * counts involved are exact in double up to 2^53, so the rounded
    * quotient is IEEE-identical across engines. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type").as("from_type"))
      .withColumn("to_type", lead("from_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_trans"))
    val wf = Window.partitionBy("from_type")
    val wt = Window.partitionBy("to_type")
    val wg = Window.partitionBy()
    pairs
      .withColumn("n_from", sum("n_trans").over(wf))
      .withColumn("n_to", sum("n_trans").over(wt))
      .withColumn("n_total", sum("n_trans").over(wg))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        // numerator/denominator go through double BEFORE the multiply:
        // the long·long products overflow past ~3e9 transitions (1e12 at
        // the documented scale), wrapping silently under non-ANSI
        // arithmetic; in double the products stay exact up to 2^53 and
        // merely lose ulps beyond — never the sign
        round(col("n_trans").cast("double") * col("n_total") /
              (col("n_from").cast("double") * col("n_to")), 4).as("lift"))
      .orderBy("from_type", "to_type")
  }
}
