package graft

import org.apache.spark.sql.functions._
import graft.ops.Aggregates

/** Why votesPerCandidateSalted exists: under a hot key, the plain
  * one-phase groupBy funnels the whole key through ONE reducer, while the
  * salted two-phase plan spreads it over `buckets` reducers and merges
  * `buckets` partial rows. Correctness is oracle-checked already; this
  * spec demonstrates the mechanism on a skewed fixture. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 200k events, 95% on one hot key — the "one candidate dominates the
    * election" shape from the reference domain. */
  private lazy val skewed = spark.range(200000)
    .select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(20)) < 19, lit("landslide"))
        .otherwise(concat(lit("minor_"), pmod(col("id"), lit(4)))).as("event_type"),
      (pmod(col("id") * 31, lit(97)) / 10.0).as("value"))

  test("salted aggregation equals the plain aggregation on skewed data") {
    val plain = Aggregates.votesPerCandidate(skewed)
      .as[(String, Double, Long)].collect()
      .map { case (t, v, n) => t -> (v, n) }.toMap
    val salted = Aggregates.votesPerCandidateSalted(skewed)
      .as[(String, Double, Long)].collect()
      .map { case (t, v, n) => t -> (v, n) }.toMap
    assert(salted === plain)
  }

  test("phase 1 spreads the hot key over `buckets` groups of even size") {
    val buckets = 16
    // recreate the salted plan's phase-1 grouping and inspect group sizes
    val phase1 = skewed
      .groupBy(col("event_type"), pmod(col("event_id"), lit(buckets)).as("__salt"))
      .agg(count(lit(1)).as("n"))
    val hot = phase1.filter(col("event_type") === "landslide")
      .select("n").as[Long].collect()
    assert(hot.length === buckets,
      s"hot key must occupy all $buckets salt groups, got ${hot.length}")
    val hotTotal = hot.sum
    val ideal = hotTotal.toDouble / buckets
    assert(hot.max <= ideal * 1.25,
      s"salt groups must be balanced: max ${hot.max} vs ideal $ideal")
    // without salt, the same key is a single group of hotTotal rows — the
    // single-reducer bottleneck the salted plan removes
    assert(hotTotal > 100000L)
  }

  test("salted plan pays exactly one extra (cheap) exchange") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    val plain = exchanges(Aggregates.votesPerCandidate(skewed))
    val salted = exchanges(Aggregates.votesPerCandidateSalted(skewed))
    assert(salted === plain + 1,
      "two-phase = one extra exchange, carrying only buckets×keys rows")
  }
}
