package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Last-touch attribution against hand-computed outcomes: window
  * cut, last-not-first touch, purchases never self-attribute,
  * same-timestamp ordering by event_id. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  test("attribution channels match the hand-planted timeline") {
    val events = Seq(
      // user 1: view 1h before purchase -> view
      (1L, ts(0), 10L, "view", 0.0), (2L, ts(60), 10L, "purchase", 100.0),
      // user 2: click 25h before -> outside 24h window -> direct
      (3L, ts(0), 20L, "click", 0.0), (4L, ts(1500), 20L, "purchase", 50.0),
      // user 3: nothing before -> direct
      (5L, ts(0), 30L, "purchase", 25.0),
      // user 4: view then click then purchase -> LAST touch = click
      (6L, ts(0), 40L, "view", 0.0), (7L, ts(10), 40L, "click", 0.0),
      (8L, ts(20), 40L, "purchase", 75.0),
      // user 5: a preceding PURCHASE is not a touch -> direct, then
      // the view attributes the second purchase
      (9L, ts(0), 50L, "purchase", 10.0), (10L, ts(5), 50L, "view", 0.0),
      (11L, ts(10), 50L, "purchase", 20.0),
      // user 6: same timestamp, smaller event_id -> still a touch
      (12L, ts(0), 60L, "signup", 0.0), (13L, ts(0), 60L, "purchase", 30.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // same plan as the ev_attribution registry entry, over the
    // planted frame
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(
      when(col("event_type") =!= "purchase",
        struct(col("ts").as("tts"), col("event_type").as("tch"))),
      ignoreNulls = true).over(w)
    val chan = events.withColumn("_t", touch)
      .where(col("event_type") === "purchase")
      .select(
        when(col("_t").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("_t.tts")) <= 86400000000L,
          col("_t.tch")).otherwise(lit("direct")).as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("value").as("rev"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(chan("view") == ((2L, 120.0)), chan.toString)   // users 1, 5b
    assert(chan("direct") == ((3L, 85.0)), chan.toString)  // users 2, 3, 5a
    assert(chan("click") == ((1L, 75.0)), chan.toString)   // user 4 (LAST)
    assert(chan("signup") == ((1L, 30.0)), chan.toString)  // user 6 (same ts)
    assert(!chan.contains("purchase"), chan.toString)
  }
}
