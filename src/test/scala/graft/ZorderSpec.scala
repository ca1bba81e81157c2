package graft

import org.apache.spark.sql.functions._

/** Z-order data skipping: the property the layout exists for — a
  * two-dimensional box predicate must intersect FEWER files' min/max
  * rectangles under Morton order than under a hash layout (parquet
  * prunes by exactly those footer stats, so file-rectangle
  * intersection count is the engine-visible skipping bound). Result
  * parity with the source table is asserted alongside; the graded
  * `storage_zorder_scan` query adds the cross-engine oracle.
  */
class ZorderSpec extends SparkSpec {

  private def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey"),
             min("l_suppkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("morton layout prunes a 2-D box; hash layout cannot") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_returnflag")
    val zdir = graft.ops.Storage.zorderRoundTrip(
      li, "l_partkey", "l_suppkey", 16)
    val rdir = java.nio.file.Files
      .createTempDirectory("graft_zrand_").toString
    li.repartition(16).write.mode("overwrite").parquet(rdir)

    // a ~10% × ~20% box of the key space (sf0.001: partkey 0..199,
    // suppkey 0..9)
    val (pLo, pHi, sLo, sHi) = (50L, 69L, 2L, 3L)
    def intersecting(boxes: Seq[(Long, Long, Long, Long)]): Int =
      boxes.count { case (pMin, pMax, sMin, sMax) =>
        pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi
      }
    val zHit = intersecting(fileBoxes(zdir))
    val rHit = intersecting(fileBoxes(rdir))
    assert(zHit * 2 <= rHit,
      s"z-order must at least halve the touched files: z=$zHit rand=$rHit")

    // layout transparency: the box scan returns identical rows
    def boxAgg(dir: String) =
      spark.read.parquet(dir)
        .filter(col("l_partkey").between(pLo, pHi) &&
                col("l_suppkey").between(sLo, sHi))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast("long")).as("q"))
        .collect().toSet
    val direct = li
      .filter(col("l_partkey").between(pLo, pHi) &&
              col("l_suppkey").between(sLo, sHi))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast("long")).as("q"))
      .collect().toSet
    assert(boxAgg(zdir) == direct && boxAgg(rdir) == direct,
      "layout must never change results")
    assert(direct.nonEmpty, "vacuous: empty box")
  }

  test("morton interleave is the textbook bit spread") {
    // spot-check zValue against a driver-side reference implementation
    def spread(x: Long): Long = {
      var a = x & 0xFFFFL
      a = (a | (a << 8)) & 0x00FF00FFL
      a = (a | (a << 4)) & 0x0F0F0F0FL
      a = (a | (a << 2)) & 0x33333333L
      (a | (a << 1)) & 0x55555555L
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
                    (199L, 9L), (65535L, 65535L))
    val df = spark.createDataFrame(cases).toDF("a", "b")
      .withColumn("z", graft.ops.Storage.zValue(col("a"), col("b")))
    df.collect().foreach { r =>
      val expect = spread(r.getLong(0)) | (spread(r.getLong(1)) << 1)
      assert(r.getLong(2) == expect,
        s"(${r.getLong(0)}, ${r.getLong(1)}): ${r.getLong(2)} != $expect")
    }
  }
}
