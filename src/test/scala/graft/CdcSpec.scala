package graft

import org.apache.spark.sql.functions._

/** CDC shapes (SCD2 history, MERGE upsert) and temperature mixing:
  * structural invariants the row-hash oracle can't state directly —
  * interval chains must tile each key's timeline, the merge must
  * partition the key space into non-empty action classes, and the
  * temperature targets must actually tilt keep-rates toward small
  * groups.
  */
class CdcSpec extends SparkSpec {

  test("scd2: intervals chain per key, exactly one current version") {
    val hist = SparkEntry.queries("cdc_scd2_history")(spark, sfDir).cache()
    val events = Tables.events(spark, sfDir)
    assert(hist.count() == events.count(), "every change must version")
    // exactly one open interval per key
    val perKey = hist.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"))
    assert(perKey.filter(col("n_open") =!= 1).count() == 0)
    // closed intervals chain: valid_to = the NEXT version's valid_from
    // (replay lead on the result itself and compare)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy("valid_from_us", "event_id")
    val chained = hist
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .filter(!col("is_current"))
    assert(chained.filter(col("valid_to_us") =!= col("next_from"))
      .count() == 0, "closed interval must end where the next begins")
  }

  test("merge: all three action branches populated and mutually exact") {
    val merged = SparkEntry.queries("cdc_merge_upsert")(spark, sfDir).cache()
    val byAction = merged.groupBy("action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction.getOrElse("insert", 0L) > 0, "no inserts: remap vacuous")
    assert(byAction.getOrElse("update", 0L) > 0, "no updates")
    assert(byAction.getOrElse("keep", 0L) > 0, "no keeps")
    val nBase = Tables.customer(spark, sfDir).count()
    // keeps + updates = base; inserts are exactly the out-of-dim keys
    assert(byAction("keep") + byAction("update") == nBase)
    val maxKey = nBase - 1
    assert(merged.filter(col("action") === "insert" &&
      col("key") <= maxKey).count() == 0,
      "insert keys must lie outside the dimension")
    // updated rows carry the change value, kept rows the base value
    val updated = merged.filter(col("action") === "update")
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
    assert(updated.join(base, col("key") === col("c_custkey"))
      .filter(col("value") === col("c_acctbal")).count() <
        byAction("update"),
      "updates must actually change values (fixture sanity)")
  }

  test("temperature mix: keep-rate tilts toward small groups, total ~ half") {
    val kept = SparkEntry.queries("mix_temperature")(spark, sfDir)
      .groupBy("lang").count().withColumnRenamed("count", "n_kept")
    val before = Tables.documents(spark, sfDir)
      .groupBy("lang").count().withColumnRenamed("count", "n_before")
    val rates = kept.join(before, "lang")
      .select(col("lang"), col("n_kept"), col("n_before"),
        expr("(n_kept * 10000) div n_before").as("rate_bp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    val biggest = rates.maxBy(_._3)
    val smallest = rates.minBy(_._3)
    assert(smallest._4 > biggest._4,
      s"α=1/2 must upweight the smallest group: $rates")
    val total = rates.map(_._3).sum
    val keptTotal = rates.map(_._2).sum
    assert(keptTotal <= total / 2, "targets must not exceed the budget")
    assert(keptTotal > total * 2 / 5,
      s"integer rounding should stay near half: $keptTotal of $total")
  }
}
