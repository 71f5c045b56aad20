package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BandPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val banded = graft.core.Tables.spread(
        df.select(col("doc_id").as("_id"), col("text")), col("doc_id"))
      .select(col("_id"),
        graft.functions.Expressions.minHashBands(col("text"), 5, 8, 2).as("_bands"))
      .select(col("_id"), posexplode(col("_bands")).as(Seq("_band", "_key")))
    banded.explain("formatted")
    spark.stop()
  }
}
