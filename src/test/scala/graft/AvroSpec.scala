package graft

import org.apache.spark.sql.functions._
import graft.sources.AvroIO

/** The Avro InputFormat bridge: container files written per partition,
  * read back distributed, bit-exact round-trip. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("write then read round-trips every row bit-exactly across splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_spec_")
      .toString
    val src = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    AvroIO.writeEvents(src, dir, parts = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, s"expected 4 container files, got ${files.length}")
    val back = AvroIO.readEvents(spark, dir)
    // the read parallelizes over the file splits, not one task
    assert(back.rdd.getNumPartitions >= 4)
    val a = src.as[(Long, Long, String, Double)].collect().toSet
    val b = back.as[(Long, Long, String, Double)].collect().toSet
    assert(b == a, "avro round-trip must preserve every row bit-exactly")
  }

  test("roundTripAggregate equals the direct aggregate on the source") {
    val got = AvroIO
      .roundTripAggregate(spark, Tables.events(spark, sfDir))
      .as[(String, Long, Long, Long)].collect().toSeq
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("cents"),
           max("event_id").as("max_id"))
      .orderBy("event_type")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }
}
