package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time each EP2 stage frame at sf0.1. */
object ProfileEp2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val t00 = System.nanoTime()
    val stages = graft.Pipeline.stages(spark, dir)
    println(f"build (incl. eager barriers) ${(System.nanoTime() - t00) / 1e9}%8.2f s")
    var prev = (System.nanoTime() - t00) / 1e9
    stages.foreach { case (name, df) =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-12s count=$n%-8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val t1 = System.nanoTime()
    graft.Pipeline.flagship(spark, dir).count()
    println(f"flagship end-to-end ${(System.nanoTime() - t1) / 1e9}%8.2f s")
    spark.stop()
  }
}
