package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** nearestJoin semantics on a hand case: past preferred on ties,
  * strict nearest otherwise, null row for keys with no right side. */
class NearestJoinSpec extends SparkSpec {
  import spark.implicits._

  test("nearestJoin: direction choice, exact diffs, missing-key nulls") {
    val l = Seq(
      (10L, 1L, "2024-01-01 10:00:00"),   // nearest: past err at 09:59
      (11L, 1L, "2024-01-01 12:00:00"),   // nearest: future err at 12:01
      (12L, 2L, "2024-01-01 10:00:00"))   // user 2: no errors
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Seq(
      (100L, 1L, "2024-01-01 09:59:00"),
      (101L, 1L, "2024-01-01 12:01:00"),
      (102L, 1L, "2024-01-01 12:05:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val rows = Temporal.nearestJoin(l, r, "user_id", "ts", "event_id")
      .orderBy("event_id").collect()
    assert(rows(0).getAs[Long]("event_id_n") == 100L, rows(0))
    assert(rows(0).getAs[Long]("side") == 0L)
    assert(rows(0).getAs[Long]("diff_us") == 60000000L)
    assert(rows(1).getAs[Long]("event_id_n") == 101L, rows(1))
    assert(rows(1).getAs[Long]("side") == 1L)
    assert(rows(1).getAs[Long]("diff_us") == 60000000L)
    assert(rows(2).isNullAt(rows(2).fieldIndex("event_id_n")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("side")))
  }

  test("nearestJoin: NULL payload columns and duplicate left rows survive") {
    // the r7 formulation recombined two as-of passes with an inner
    // equi-join on all left columns: a NULL in any left column
    // dropped the row, and fully-duplicate left rows fanned out
    // multiplicatively — the window formulation must do neither
    val l = Seq(
      (Some(10L), 1L, "2024-01-01 10:00:00", Option.empty[String]), // NULL col
      (Some(10L), 1L, "2024-01-01 10:00:00", Option.empty[String]), // exact dup
      (Option.empty[Long], 1L, "2024-01-01 12:00:00", Some("x")))   // NULL id
      .toDF("event_id", "user_id", "ts_s", "label")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Seq(
      (100L, 1L, "2024-01-01 09:59:00"),
      (101L, 1L, "2024-01-01 12:01:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Temporal.nearestJoin(l, r, "user_id", "ts", "event_id")
      .orderBy(col("ts"), col("event_id")).collect()
    assert(out.length == 3, s"expected 3 rows (one per left row), got ${out.length}")
    assert(out(0).getAs[Long]("event_id_n") == 100L) // dup row 1
    assert(out(1).getAs[Long]("event_id_n") == 100L) // dup row 2
    assert(out(2).getAs[Long]("event_id_n") == 101L) // NULL-id row kept
    assert(out(2).getAs[Long]("side") == 1L)
  }

  test("nearestJoin plan: both window frames are running (O(n)), single shuffle") {
    val l = Seq((1L, 1L, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val plan = Temporal.nearestJoin(l, l, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString.toLowerCase
    // a currentRow..unboundedFollowing frame is Spark's
    // UnboundedFollowingWindowFunctionFrame — O(n²) per key group;
    // the forward pass must be the reversed-order running frame
    assert(!plan.contains("unboundedfollowing"), plan)
    assert("exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
