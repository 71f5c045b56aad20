package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

class StatefulStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("running-total milestones emit once per crossed step") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 60.0),
      (1L, "2024-01-01 10:05:00", 60.0),   // crosses 100
      (1L, "2024-01-01 10:10:00", 200.0),  // crosses 200 and 300
      (2L, "2024-01-01 10:00:00", 40.0))   // never crosses
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Streams.runningTotalAlerts(events, step = 100.0)
      .orderBy("user_id", "milestone")
      .as[(Long, Double, Long)].collect().toList
    assert(out.map(_._1) == List(1L, 1L))
    assert(out.map(_._3) == List(1L, 3L))   // milestones crossed: 1, then straight to 3
    assert(out.last._2 == 320.0)
  }
}
