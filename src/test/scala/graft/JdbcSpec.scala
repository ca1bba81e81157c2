package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcIO

/** Real JDBC round-trips against Spark's bundled embedded Derby — the
  * genuine `spark.read/write.jdbc` code path the reference uses for
  * Postgres, no network required. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("write.jdbc then read.jdbc preserves rows and schema shape") {
    val url = JdbcIO.freshUrl()
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", -4.0))
      .toDF("id", "name", "v")
    JdbcIO.writeTable(df, url, "t_roundtrip")
    val back = JdbcIO.readTable(spark, url, "t_roundtrip")
      .as[(Long, String, Double)].collect().toSet
    assert(back === Set((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", -4.0)))
  }

  test("roundTrip aggregate equals the direct in-memory aggregate") {
    val events = Tables.events(spark, sfDir)
    val viaJdbc = JdbcIO.roundTrip(spark, events)
      .as[(Long, Double)].collect().head
    val direct = events.groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"))
      .agg(count(lit(1)).as("n_users"),
           round(sum("total_value"), 2).as("sum_total"))
      .as[(Long, Double)].collect().head
    assert(viaJdbc === direct)
  }
}
