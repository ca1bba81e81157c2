package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling harness (not part of the driver contract): times the
  * named SparkEntry queries N times each in one warmed session, printing
  * per-run seconds — the fast feedback loop for per-query optimization
  * without Bench's full warm-up region. Usage:
  *   runMain graft.tools.Profile <sfDir> <reps> <name>[,<name>...] [-x]
  * `-x` anywhere after the two positional args turns on
  * .explain("formatted") for EVERY listed query after its timings. */
object Profile {
  def main(args: Array[String]): Unit = {
    graft.TmpDirs.install()
    // see Bench.main: load-order-independent ImageIO cache opt-out
    javax.imageio.ImageIO.setUseCache(false)
    val sfDir = args(0)
    val reps = args(1).toInt
    val rest = args.drop(2)
    val explain = rest.contains("-x")
    val names = rest.filterNot(_ == "-x").flatMap(_.split(','))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Bench's TIMED session config, from the one shared definition
    // (TmpDirs.timedSessionBuilder) so profiled readings are the config
    // the driver actually times — a static-plan profile of an AQE-timed
    // seat optimizes the wrong plan, and a hand-copied block drifts.
    val spark = graft.TmpDirs.timedSessionBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17: the NativeVectorMathRule fusion must be installed in
    // EVERY driving session (it was previously spec-only - the graded
    // similarity paths ran interpreted HOF dot products)
    graft.functions.GraftExtensions.installOptimizations(spark)
    // queries is a def that rebuilds the full entry map per access —
    // materialize it once for the lookup loop
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
