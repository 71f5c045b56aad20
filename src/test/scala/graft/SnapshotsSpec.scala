package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Manifest-versioned snapshots: commit, time travel, file-level
  * copy-on-write sharing, manifest round-trip. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir = Files.createTempDirectory("graft_snap").toString

  test("commit + time-travel read returns each version's exact content") {
    val tdir = freshDir
    val base = (0L until 64L).map(k => (k, k * 1.5)).toDF("k", "v")
    val bucket = pmod(col("k"), lit(4))
    val m1 = Snapshots.commit(base, tdir, 1, bucket, nBuckets = 4)
    // v2: rewrite bucket 0 only, v doubled there
    val v2c = base.where(pmod(col("k"), lit(4)) === 0)
      .withColumn("v", col("v") * 2)
    val m2 = Snapshots.commit(v2c, tdir, 2, bucket, nBuckets = 4,
      parent = Some(m1), touched = Some(Set(0)))

    val v1 = Snapshots.read(spark, m1).as[(Long, Double)].collect().sortBy(_._1)
    assert(v1.toSeq == (0L until 64L).map(k => (k, k * 1.5)))
    val v2 = Snapshots.read(spark, m2).as[(Long, Double)].collect().sortBy(_._1)
    assert(v2.toSeq == (0L until 64L).map(k =>
      (k, if (k % 4 == 0) k * 3.0 else k * 1.5)))
  }

  test("copy-on-write shares untouched buckets' files verbatim") {
    val tdir = freshDir
    val base = (0L until 64L).map(k => (k, k.toString)).toDF("k", "s")
    val bucket = pmod(col("k"), lit(4))
    val m1 = Snapshots.commit(base, tdir, 1, bucket, nBuckets = 4)
    val m2 = Snapshots.commit(
      base.where(pmod(col("k"), lit(4)) === 1).withColumn("s", lit("x")),
      tdir, 2, bucket, nBuckets = 4, parent = Some(m1), touched = Some(Set(1)))
    assert(Snapshots.cowShared(m1, m2, Set(1)))
    // the inherited buckets are the SAME paths (shared bytes)
    (Set(0, 2, 3)).foreach(b => assert(m2.files(b) == m1.files(b), s"bucket $b"))
    assert(m2.files(1) != m1.files(1))
    // and the check is not vacuous: wrong touched-set fails it
    assert(!Snapshots.cowShared(m1, m2, Set(0)))
  }

  test("manifests round-trip through JSON and drive readVersion") {
    val tdir = freshDir
    val base = (0L until 16L).map(k => (k, k * 2)).toDF("k", "v")
    val m1 = Snapshots.commit(base, tdir, 1, pmod(col("k"), lit(2)), nBuckets = 2)
    val loaded = Snapshots.loadManifest(tdir, 1)
    assert(loaded == m1)
    assert(Snapshots.readVersion(spark, tdir, 1).count() == 16)
    intercept[IllegalArgumentException] {
      Snapshots.loadManifest(tdir, 99)
    }
  }

  test("initial commit must cover every bucket") {
    val tdir = freshDir
    val base = (0L until 8L).map(k => (k, k)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Snapshots.commit(base, tdir, 1, pmod(col("k"), lit(2)), nBuckets = 2,
        touched = Some(Set(0)))
    }
  }
}
