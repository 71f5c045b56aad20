package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Det

/** Structured-Streaming-shaped operators over the `events` table.
  *
  * The reference is strictly batch (SURVEY §2.10); these are the
  * extension surface. Each transform is written against a plain
  * DataFrame so the same code runs in a batch query (driver oracle
  * checks) and under `readStream` (StreamsSpec drives it with the
  * parquet source + memory sink).
  */
object Streams {

  /** Tumbling-window aggregate: per (hour, event_type) counts + exact
    * sums. `window().start` on an aligned width == date_trunc. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 6).as("v_sum"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("v_sum"))

  /** Session windows per user with a 30-minute inactivity gap: a new
    * session starts when ts − previous ts ≥ gap. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 6).as("v_sum"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("v_sum"))

  /** Streaming flavor of [[hourlyTypeCounts]] with a watermark, for
    * the real `readStream` path. */
  def hourlyTypeCountsStream(events: DataFrame): DataFrame =
    hourlyTypeCounts(events.withWatermark("ts", "2 hours"))

  /** Read the events table as a (bounded) stream: same parquet file,
    * streaming source semantics. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(schema).parquet(s"$dir")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
