package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for the named SparkEntry queries
  * to files — the plan-evidence artifact for optimization rounds. Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]
  * writes <outDir>/<name>_<suffix>.txt per query. Static batch plans only:
  * streaming/composite entries execute on construction, so their frames'
  * plans are the post-run result frame, and the file says so. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    graft.TmpDirs.install()
    javax.imageio.ImageIO.setUseCache(false)
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).flatMap(_.split(',')).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17: the NativeVectorMathRule fusion must be installed in
    // EVERY driving session (it was previously spec-only - the graded
    // similarity paths ran interpreted HOF dot products)
    graft.functions.GraftExtensions.installOptimizations(spark)
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val out = outDir.resolve(s"${n}_$suffix.txt")
      try {
        val df = qs(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(out, plan)
        println(s"[plandump] wrote $out (${plan.length} chars)")
      } catch { case e: Throwable =>
        java.nio.file.Files.writeString(out, s"FAILED: ${e.getMessage}")
        println(s"[plandump] FAILED $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
