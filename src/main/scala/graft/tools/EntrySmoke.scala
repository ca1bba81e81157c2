package graft.tools
import org.apache.spark.sql.SparkSession
/** Smoke: the driver's `SparkEntry.entry` contract (rows > 0 at sf0.001). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    graft.TmpDirs.install()
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
