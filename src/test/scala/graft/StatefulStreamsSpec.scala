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

  test("streaming near-dedup across micro-batches == batch verified pairs") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = core.Tables.load(spark, sf001, "documents")
    val batch = graft.operators.Dedup.minhashVerifiedPairs(
        docs, "doc_id", "text", threshold = 0.25,
        shingleSize = 5, numHashes = 8, bandSize = 4, poly = true)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)

    // split the corpus into two parquet files and force one file per
    // micro-batch, so matches must cross BATCH boundaries through the
    // bucket state (not just within one invocation)
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_stream")
    docs.where(col("doc_id") % 2 === 0).write.parquet(s"$dir/p0")
    docs.where(col("doc_id") % 2 === 1).write.parquet(s"$dir/p1")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_neardup_src")
    var n = 0
    Seq("p0", "p1").foreach { p =>
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$p"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach { f =>
          java.nio.file.Files.copy(f, srcDir.resolve(s"$n.parquet")); n += 1
        }
    }
    val schema = docs.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = Streams.nearDupPairs(stream, threshold = 0.25)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("neardup_out")
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(5)} batch-only=${(batch -- streamed).take(5)}")
  }

  test("streaming CEP across micro-batches == batch lead-window pattern") {
    import org.apache.spark.sql.streaming.Trigger
    val ev = core.Tables.load(spark, sf001, "events")
    val batch = SparkEntry.queries("ev_cep_pattern")(spark, sf001)
      .select("user_id", "view_id", "click_id", "purchase_id", "span_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)

    // split by event TIME (per-user in-order arrival — the source
    // contract), one file per micro-batch, so patterns must span the
    // batch boundary through the per-user state
    val mid = ev.select(expr("percentile(unix_micros(ts), 0.5)"))
      .head.getDouble(0).toLong
    val dir = java.nio.file.Files.createTempDirectory("graft_cep_stream")
    // one file per half: within a micro-batch the state fn sorts by
    // (ts, id); ACROSS batches arrival order must follow event time
    ev.where(unix_micros(col("ts")) <= mid).repartition(1).write.parquet(s"$dir/p0")
    ev.where(unix_micros(col("ts")) > mid).repartition(1).write.parquet(s"$dir/p1")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cep_src")
    var n = 0
    Seq("p0", "p1").foreach { p =>
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$p"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach { f =>
          val dst = srcDir.resolve(s"$n.parquet")
          java.nio.file.Files.copy(f, dst)
          // pin mtimes so micro-batch order follows event time (the
          // file source orders by modification time; same-millisecond
          // copies would make the order arbitrary)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + n * 60000L))
          n += 1
        }
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = Streams.streamCepMatches(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("cep_out")
      .select("user_id", "view_id", "click_id", "purchase_id", "span_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("streaming rolling anomaly across micro-batches == batch window twin") {
    import org.apache.spark.sql.streaming.Trigger
    val ev = core.Tables.load(spark, sf001, "events")
    val batch = graft.operators.Temporal.rollingAnomaly(
        ev, "user_id", "ts", "event_id", "value")
      .select("user_id", "event_id", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSet
    assert(batch.exists(_._4), "batch twin must flag at least one anomaly")

    // split by event TIME so trailing windows must span the batch
    // boundary through the per-user state
    val mid = ev.select(expr("percentile(unix_micros(ts), 0.5)"))
      .head.getDouble(0).toLong
    val dir = java.nio.file.Files.createTempDirectory("graft_anom_stream")
    ev.where(unix_micros(col("ts")) <= mid).repartition(1).write.parquet(s"$dir/p0")
    ev.where(unix_micros(col("ts")) > mid).repartition(1).write.parquet(s"$dir/p1")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_anom_src")
    var n = 0
    Seq("p0", "p1").foreach { p =>
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$p"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach { f =>
          val dst = srcDir.resolve(s"$n.parquet")
          java.nio.file.Files.copy(f, dst)
          // the file source orders micro-batches by modification time;
          // two quick copies can land in the same millisecond, which
          // would feed the halves in arbitrary order — pin the mtimes
          // so arrival follows event time (the source contract)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + n * 60000L))
          n += 1
        }
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = Streams.anomalyStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("anom_out")
      .select("user_id", "event_id", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("CDC foreachBatch apply == batch current state, however batched") {
    // multi-file copy so maxFilesPerTrigger=1 yields several
    // micro-batches; file order is whatever the source lists, and the
    // final state must be identical anyway (newer-wins merge)
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cdc_src").toString
    ev.repartition(5).write.mode("overwrite").parquet(srcDir)
    val batch = Streams.cdcCurrentState(ev)
      .as[(Long, java.sql.Timestamp, String, Double, Long)]
      .collect().toSet
    Seq(1, 3).foreach { mfpt =>
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"graft_cdc_state_$mfpt").toString
      val fin = Streams.cdcApplyStream(spark, srcDir, stateDir,
          maxFilesPerTrigger = mfpt)
        .as[(Long, java.sql.Timestamp, String, Double, Long)]
        .collect().toSet
      assert(fin == batch,
        s"mfpt=$mfpt stream-only=${(fin -- batch).take(3)} batch-only=${(batch -- fin).take(3)}")
    }
  }
}
