package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Reindex

/** Reindex.consecutiveIds must be byte-identical to the exact (but
  * single-task) `row_number().over(Window.orderBy(keys))` form at any
  * partition count — including empty partitions, partition counts
  * exceeding the row count, NULL keys, and duplicate keys. */
class ReindexSpec extends SparkSpec {
  import spark.implicits._

  test("equals global row_number on lineitem keys (unique order)") {
    val li = Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_linenumber")
    val expected = li.select(
        row_number().over(Window.orderBy("l_orderkey", "l_linenumber"))
          .cast("long").as("srcid"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy("srcid").collect()
    val got = Reindex.consecutiveIds(li, "srcid",
        Seq(col("l_orderkey"), col("l_linenumber")), base = 1L)
      .select("srcid", "l_orderkey", "l_linenumber")
      .orderBy("srcid").collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("ids stay consecutive with NULL and duplicate keys, any base") {
    val df = Seq[(java.lang.Long, String)](
      (3L, "c"), (null, "z"), (1L, "a"), (3L, "d"), (null, "y"), (2L, "b"))
      .toDF("k", "v")
    val out = Reindex.consecutiveIds(df, "id", Seq(col("k")), base = 0L,
      numPartitions = 4).collect()
    assert(out.map(_.getAs[Long]("id")).sorted.toSeq == (0L to 5L))
    // nulls-first ordering: the two NULL keys take ids 0 and 1
    val byId = out.sortBy(_.getAs[Long]("id"))
    assert(byId.take(2).forall(_.isNullAt(0)))
    assert(byId.drop(2).map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 3L))
  }

  test("more partitions than rows; empty frame; column-name collision") {
    val tiny = Seq((2L, "b"), (1L, "a")).toDF("k", "v")
    val out = Reindex.consecutiveIds(tiny, "id", Seq(col("k")), base = 10L,
      numPartitions = 16).orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"))).toSeq
      == Seq((10L, 1L), (11L, 2L)))
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Reindex.consecutiveIds(empty, "id", Seq(col("k"))).count() == 0L)
    // user columns shadowing the internal working names must survive
    val clash = Seq((1L, 7L, 8L), (2L, 9L, 10L)).toDF("k", "_gpid", "_goff")
    val c = Reindex.consecutiveIds(clash, "id", Seq(col("k")))
      .orderBy("id").collect()
    assert(c.map(r => (r.getAs[Long]("id"), r.getAs[Long]("_gpid"),
      r.getAs[Long]("_goff"))).toSeq == Seq((0L, 7L, 8L), (1L, 9L, 10L)))
  }
}
