package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** Grouping-sets and RANGE-frame semantics: the properties that
  * distinguish them from the cube / ROWS-frame variants they sit next to.
  */
class WindowFrameSpec extends SparkSpec {
  import spark.implicits._

  test("grouping sets: exactly the asked-for slices, each a cube subset") {
    val gs = SparkEntry.queries("a8_grouping_sets")(spark, sfDir).collect()
    val cube = SparkEntry.queries("a8_cube_turnout")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(gs.map(_.toSeq).toSet.subsetOf(cube),
      "every grouping-sets row must appear in the full cube")
    // gid 0 = (seg, nation), 1 = (seg), 3 = () — and nothing else
    assert(gs.map(_.getAs[Long]("gid")).toSet == Set(0L, 1L, 3L))
    // the nation-only slice (gid 2) is exactly what was NOT asked for
    assert(cube.exists(r => r(3) == 2L), "cube sanity: gid 2 exists there")
  }

  test("range frame: same-second rows are peers; rows frame differs") {
    val ev = Seq(
      (1L, 7L, 10.0, new Timestamp(1000_000L)),
      (2L, 7L, 20.0, new Timestamp(1000_000L)), // same second as event 1
      (3L, 7L, 30.0, new Timestamp(5000_000_000L)) // hours later
    ).toDF("event_id", "user_id", "value", "ts")
    val out = Windows.movingAvgTrailing(ev, 3600L)
      .orderBy("event_id").as[(Long, Long, Double)].collect()
    // events 1 and 2 share ts_s, so BOTH see avg(10, 20) = 15 — a ROWS
    // frame would give event 1 only its own value; event 3's trailing
    // hour contains only itself
    assert(out.toSeq == Seq((1L, 7L, 15.0), (2L, 7L, 15.0), (3L, 7L, 30.0)))
  }

  test("range frame on the fixture: windows only ever shrink the mean range") {
    val df = SparkEntry.queries("w7_moving_avg_range")(spark, sfDir)
    val (lo, hi) = Tables.events(spark, sfDir)
      .agg(min("value"), max("value")).as[(Double, Double)].collect()(0)
    val bad = df.filter(col("mov_avg") < lo - 1e-9 || col("mov_avg") > hi + 1e-9)
    assert(bad.isEmpty, "a mean can never leave the value range")
    assert(df.count() == Tables.events(spark, sfDir).count())
  }
}
