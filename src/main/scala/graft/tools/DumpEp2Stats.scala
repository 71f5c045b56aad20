package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Det

/** Dev tool: dump the EP2 M3 stage's internal frames (per-cluster
  * aggregate, bin stats) so tools can diff them against the
  * PipelineOracle CTEs in DuckDB. */
object DumpEp2Stats {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/ep2stats"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = graft.Pipeline.stages(spark, dir).toMap
    val kept = stages("kept")
    val calibrated = kept.withColumn("cal_mag",
      graft.functions.Photometry.calMag(
        col("l_quantity"), col("zp_ref"),
        Some(col("l_discount")),
        Some(col("l_extendedprice") / 10000), Some(col("l_quantity") / 8)))
    // mirror of Outliers.iqrOutlierRemoval internals (equal-width
    // bins, longMeans)
    val ca = calibrated.groupBy(col("cluster"))
      .agg(
        Det.davgLong(col("cal_mag"), 8).as("av_mag"),
        (Det.davgLong(col("cal_mag"), 8) -
          Det.davgLong(col("l_quantity") + col("zp_ref"), 8)).as("mag_diff"))
      // CP-OK: dev diagnostic tool (off the query path); one row per
      // cluster
      .localCheckpoint()
    val nBins = 8
    val mm = ca.agg(min("av_mag").as("_lo"), max("av_mag").as("_hi"))
    val w = (col("_hi") - col("_lo")) / nBins
    val binned = ca.join(broadcast(mm))
      .withColumn("bin",
        when(col("av_mag") >= col("_hi"), nBins - 1)
          .otherwise(floor((col("av_mag") - col("_lo")) / w)))
      .drop("_lo", "_hi")
    val stats = binned.groupBy("bin").agg(
      round(percentile(col("mag_diff"), lit(0.5)), 6).as("_med"),
      round(percentile(col("mag_diff"), lit(0.75)) -
        percentile(col("mag_diff"), lit(0.25)), 6).as("_iqr"),
      percentile(col("mag_diff"), lit(0.5)).as("raw_med"),
      percentile(col("mag_diff"), lit(0.25)).as("raw_p25"),
      percentile(col("mag_diff"), lit(0.75)).as("raw_p75"),
      count(lit(1)).as("n"))
    binned.coalesce(1).write.mode("overwrite").parquet(s"$out/binned")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$out/stats")
    spark.stop()
  }
}
