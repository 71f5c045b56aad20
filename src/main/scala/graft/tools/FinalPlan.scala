package graft.tools
import org.apache.spark.sql.SparkSession
/** Print the FINAL adaptive physical plan of named queries after one
  * execution — explain() before an action shows isFinalPlan=false,
  * which hides AQE's broadcast-swap / coalesce decisions. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.count()
      println(s"===== $name (final) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
