package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consecutive global row ids over a total order WITHOUT a
  * single-partition window (reference: srcdf.py:137-156
  * reindex_sources, which relies on the pandas RangeIndex).
  *
  * `row_number().over(Window.orderBy(keys))` is exact but moves the
  * ENTIRE frame through one task — the classic 100 TB scale-killer.
  * The scale-safe exact form used here:
  *
  *   1. `repartitionByRange(keys)` — a range exchange; partition i
  *      holds the i-th key range, so physical partition order IS key
  *      order.
  *   2. `sortWithinPartitions(keys)` + `monotonically_increasing_id`
  *      — mono ids encode (partitionId << 33 | localRow), and because
  *      the projection sits above the sort, `localRow` follows the
  *      sorted order. Decomposing the id yields a per-partition rank
  *      with NO extra shuffle and NO window.
  *   3. Per-partition row counts (`spark_partition_id` over the same
  *      range exchange — reused, not recomputed) → cumulative offsets
  *      via a window over the ≤numPartitions-row counts frame (bounded
  *      by construction) → broadcast join back.
  *
  * id = offset(partition) + localRow + base: byte-identical to the
  * global-window form at any parallelism (ReindexSpec asserts
  * equality), with every data-carrying stage fully parallel.
  */
object Reindex {

  /** First name in `base`, `base_`, `base__`, … not already a column. */
  private def fresh(base: String, taken: Set[String]): String =
    Iterator.iterate(base)(_ + "_").dropWhile(taken).next()

  /** Consecutive ids `base, base+1, …` in `orderCols` order, appended
    * as `idCol`. Equal keys receive distinct ids in an arbitrary but
    * deterministic order (same contract as a global `row_number` over
    * a non-unique ordering). */
  def consecutiveIds(df: DataFrame, idCol: String, orderCols: Seq[Column],
                     base: Long = 0L, numPartitions: Int = 0): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val taken = df.columns.toSet
    val cMid = fresh("_gmid", taken)
    val cPid = fresh("_gpid", taken)
    val cLoc = fresh("_glocal", taken)
    val cCnt = fresh("_gcnt", taken)
    val cOff = fresh("_goff", taken)

    val ranged = df.repartitionByRange(n, orderCols: _*)
    // counts per range partition: no sort needed, tiny (≤n groups)
    val offW = Window.orderBy(cPid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(spark_partition_id().cast("long").as(cPid))
      .agg(count(lit(1)).as(cCnt))
      // bounded window: the counts frame has ≤ numPartitions rows
      .withColumn(cOff, coalesce(sum(cCnt).over(offW), lit(0L)))
      .select(cPid, cOff)
    val local = ranged.sortWithinPartitions(orderCols: _*)
      .withColumn(cMid, monotonically_increasing_id())
      .withColumn(cPid, shiftrightunsigned(col(cMid), 33))
      .withColumn(cLoc, col(cMid).bitwiseAND(lit((1L << 33) - 1)))
    local.join(broadcast(offsets), Seq(cPid))
      .withColumn(idCol, col(cOff) + col(cLoc) + lit(base))
      .drop(cPid, cMid, cLoc, cOff)
  }
}
