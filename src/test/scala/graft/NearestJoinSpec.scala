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

  test("nearestJoin: join-semantics NULL keys; internal names collision-free") {
    // NULL-key right rows match nothing (null-unsafe equality);
    // NULL-key left rows come back null-padded — never matched to a
    // NULL-key right row via the window's partitionBy
    val l = Seq(
      (Some(1L), 10L, "2024-01-01 10:00:00"),
      (Option.empty[Long], 11L, "2024-01-01 10:00:00"))
      .toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Seq(
      (Some(1L), 100L, "2024-01-01 10:01:00"),
      (Option.empty[Long], 101L, "2024-01-01 10:00:00"))
      .toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Temporal.nearestJoin(l, r, "user_id", "ts", "event_id")
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("event_id_n") == 100L)
    assert(out(1).isNullAt(out(1).fieldIndex("event_id_n")), out(1))
    // user columns named like the old hardcoded working columns must
    // pass through untouched
    val lc = Seq((1L, 10L, "2024-01-01 10:00:00", "keep"))
      .toDF("user_id", "event_id", "ts_s", "_tag")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val oc = Temporal.nearestJoin(lc, r, "user_id", "ts", "event_id").collect()
    assert(oc.length == 1 && oc(0).getAs[String]("_tag") == "keep")
    assert(oc(0).getAs[Long]("event_id_n") == 100L)
  }

  test("asofJoin: NULL-key right rows never match (join semantics)") {
    val l = Seq((Option.empty[Long], 10L, "2024-01-01 10:00:00"))
      .toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Seq((Option.empty[Long], 100L, "2024-01-01 09:00:00", 5.0))
      .toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .select("user_id", "ts", "value", "event_id")
    val out = Temporal.asofJoin(l, r, "user_id", "ts",
      payload = Seq("value"), tieBreak = "event_id").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("value_r")))
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

  test("knnJoinWithin == brute-force k-NN within radius (rank rule exact)") {
    import graft.operators.Spatial
    // the registry fixture at sf0.001: part vs supplier synthetic
    // planar points; brute-force reference over the collected sets
    val pts = core.Tables.load(spark, sf001, "part")
      .select(col("p_partkey"), (col("p_partkey") % 1000).as("px"),
        ((col("p_partkey") * 13) % 1000).as("py"))
    val sup = core.Tables.load(spark, sf001, "supplier")
      .select(col("s_suppkey"), ((col("s_suppkey") * 37) % 1000).as("sx"),
        ((col("s_suppkey") * 91) % 1000).as("sy"))
    val got = Spatial.knnJoinWithin(pts, "p_partkey", "px", "py",
        sup, "s_suppkey", "sx", "sy", radius = 150.0, k = 3)
      .select("p_partkey", "s_suppkey", "dist2", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ps = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ss = sup.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ps.flatMap { case (pid, px, py) =>
      ss.map { case (sid, sx, sy) =>
        (sid, (px - sx) * (px - sx) + (py - sy) * (py - sy))
      }.filter(_._2 <= 150L * 150L)
        .sortBy { case (sid, d2) => (d2, sid) }.take(3).zipWithIndex
        .map { case ((sid, d2), i) => (pid, sid, d2, (i + 1).toLong) }
    }.toSet
    assert(got == ref,
      s"diff: ${(got diff ref).take(3)} | ${(ref diff got).take(3)}")
    // k > 1 must genuinely widen: some left key has rank-3 rows, and
    // every (key, rank) pair is unique
    assert(got.exists(_._4 == 3L))
    assert(got.groupBy(t => (t._1, t._4)).forall(_._2.size == 1))
  }
}
