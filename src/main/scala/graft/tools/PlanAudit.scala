package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans for representative queries — the scale audit:
  * filters pushed to the parquet scan, projections pruned, dims broadcast,
  * aggregates partial'd, no stray shuffles. Run:
  * `sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.01 q6_filtered_agg j1_broadcast_enrich"`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val which = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter { case (name, _) => which.isEmpty || which(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
      }
    spark.stop()
  }
}
