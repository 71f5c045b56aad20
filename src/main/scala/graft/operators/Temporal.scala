package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators Spark lacks natively: as-of join and
  * interval (range) containment join.
  *
  * Scale design: neither ever becomes a broadcast-nested-loop or a
  * per-row range scan.
  *   - [[asofJoin]] is the union+running-last formulation: one shuffle
  *     on the join key, one window pass — O(n log n) per key group,
  *     both sides arbitrarily large.
  *   - [[rangeJoin]] buckets time into fixed-width cells; an interval
  *     joins only the points in the cells it covers (candidates ∝
  *     true matches when width ≈ interval length), an equi-join on the
  *     cell id. Both sides can be fact-sized.
  */
object Temporal {

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` and the same key (ties on ts broken by the
    * largest `tieBreak` — deterministic, engine-independent).
    *
    * Result = all left columns + the right `payload` columns suffixed
    * (`ts` -> `ts<suffix>` etc.), null when no right row precedes.
    *
    * Implementation: tag right rows 0 / left rows 1, union, and take
    * `last(payload, ignoreNulls)` over
    * (key ORDER BY ts, tag, tieBreak ROWS UNBOUNDED PRECEDING..CURRENT).
    * At equal ts the right row sorts first, so the inclusive (`<=`)
    * semantics hold; among equal-ts right rows the largest tieBreak is
    * the running last. One shuffle, no range explosion — the classic
    * scalable as-of shape (what a MergeJoin-based ASOF also does).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], tieBreak: String,
               suffix: String = "_r"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payStruct = struct((ts +: payload).map(col): _*)
    val ordT = right.schema(tieBreak).dataType
    val rAligned = right.select(
      leftCols.map { c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(lit(0).as("_tag"), col(tieBreak).as("_ord"),
        payStruct.as("_pay")): _*)
    val lAligned = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("_tag"),
        lit(null).cast(ordT).as("_ord"),
        lit(null).cast(rAligned.schema("_pay").dataType).as("_pay")): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("_tag"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rAligned.unionByName(lAligned)
      .withColumn("_asof", last(col("_pay"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select(leftCols.map(col) ++ (ts +: payload).map(p =>
        col(s"_asof.$p").as(s"$p$suffix")): _*)
  }

  /** Interval containment join: every (point, interval) pair with
    * `start <= point_ts < end`. Bucketed equi-join: points land in one
    * `bucketSeconds`-wide cell, intervals explode into the cells they
    * cover, the join key is the cell id, and the exact predicate
    * filters the candidates. A point meets an interval in exactly one
    * cell (its own), so no dedup pass is needed. Pick `bucketSeconds`
    * near the typical interval length: candidates stay O(matches).
    */
  def rangeJoin(points: DataFrame, ptTs: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketSeconds: Long): DataFrame = {
    val cell = floor(col(ptTs).cast(DoubleType) / bucketSeconds).cast(LongType)
    val cells = sequence(
      floor(col(startCol).cast(DoubleType) / bucketSeconds).cast(LongType),
      floor(col(endCol).cast(DoubleType) / bucketSeconds).cast(LongType))
    points.withColumn("_cell", cell)
      .join(intervals.withColumn("_cell", explode(cells)), Seq("_cell"))
      .where(col(ptTs) >= col(startCol) && col(ptTs) < col(endCol))
      .drop("_cell")
  }

  /** Top-k rows per group by `order` (largest first, deterministic
    * tie-break columns required in `order`) — the "best k per key"
    * idiom as one window pass; partial top-k runs map-side via the
    * rank filter pushed into the window's sort. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rk", row_number().over(w).cast(LongType))
      .where(col("_rk") <= k)
      .withColumnRenamed("_rk", "rank_in_group")
  }
}
