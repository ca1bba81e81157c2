package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

/** Salted shuffle join: semantics must be EXACTLY the unsalted join
  * (row multiplicity included), while the mechanism — salt in the join
  * key, build side replicated per salt, hot key spread across salt
  * buckets — is what the spec pins; the oracle only sees the
  * transparent result.
  */
class JoinSaltSpec extends SparkSpec {

  private def probe = Tables.events(spark, sfDir)
    .select("event_id", "user_id", "value")
  private def build = Tables.customer(spark, sfDir)
    .select("c_custkey", "c_mktsegment")

  test("salted join is row-for-row the plain join") {
    val salted = Joins.saltedJoin(probe, build,
      "user_id", "c_custkey", "event_id", 8)
      .select("event_id", "user_id", "c_custkey", "c_mktsegment")
    val plain = probe.join(build, col("user_id") === col("c_custkey"))
      .select("event_id", "user_id", "c_custkey", "c_mktsegment")
    // multiset compare: group by full row
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(df.columns.map(col): _*).count().collect().toSet
    assert(bag(salted) == bag(plain))
    assert(plain.count() > 0, "vacuous: empty join")
  }

  test("salt rides the join key and the hot key spreads across buckets") {
    val salted = Joins.saltedJoin(probe, build,
      "user_id", "c_custkey", "event_id", 8)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"salt must participate in the join keys:\n$plan")
    // the hottest probe key's rows must occupy several salt buckets —
    // the whole point of the construction
    val hot = probe.groupBy("user_id").count()
      .orderBy(desc("count"), asc("user_id")).limit(1)
      .collect()(0).getLong(0)
    val buckets = probe.filter(col("user_id") === hot)
      .select(pmod(hash(col("event_id")), lit(8)).as("s"))
      .distinct().count()
    assert(buckets >= 4, s"hot key $hot spread over only $buckets/8 buckets")
  }

  test("incremental join maintenance equals the one full join, ΔE⋈ΔD included") {
    import spark.implicits._
    // crafted so every decomposition cell is non-empty: user 10 is a
    // DELTA dim key (custkey%10==0) hit by BOTH base (even id) and delta
    // (odd id) events — the ΔE⋈ΔD corner that double-counts if the
    // middle term joins the full dim AND the third term re-adds it
    val ev = Seq(
      (2L, 10L, 1.00), (3L, 10L, 2.00),   // base+delta events on delta dim
      (4L, 11L, 3.00), (5L, 11L, 4.00),   // base+delta events on base dim
      (6L, 99L, 9.00)                      // unmatched key drops out
    ).toDF("event_id", "user_id", "value")
    val dim = Seq((10L, 7L), (11L, 3L)).toDF("c_custkey", "c_nationkey")
    val got = Joins.incrementalJoinMerge(ev, dim)
      .as[(Long, Long, Long)].collect().toSeq
    // full-join truth: nation 7 gets cents 100+200, nation 3 gets 300+400
    assert(got === Seq((3L, 2L, 700L), (7L, 2L, 300L)))
    // and on the real fixture the decomposition matches the plain join
    val full = probe.join(
        Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .as[(Long, Long, Long)].collect().toSet
    val inc = Joins.incrementalJoinMerge(
        Tables.events(spark, sfDir), Tables.customer(spark, sfDir))
      .as[(Long, Long, Long)].collect().toSet
    assert(inc === full)
  }
}
