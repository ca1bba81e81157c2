package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainTop {
  def main(args: Array[String]): Unit = {
    graft.TmpDirs.install()
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    args.foreach { n =>
      println(s"===== $n =====")
      try println(qs(n)(spark, "/root/testdata/sf0.01").queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(4000))
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
