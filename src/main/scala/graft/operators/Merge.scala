package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) — snapshot maintenance without a table
  * format: apply a keyed change batch (updates, inserts, tombstoned
  * deletes) onto the previous snapshot in ONE full-outer hash join.
  * The daily-compaction shape every 100 TB dimension/state table
  * runs; with both sides bucketed on the key (X-S15) the join is
  * exchange-free, which is exactly how production MERGE amortizes.
  */
object Merge {

  /** `changes` carries the snapshot's columns plus a boolean
    * `deleteCol` tombstone; at most one change row per key. Returns
    * the new snapshot (snapshot schema): changed keys take the change
    * row (dropped when tombstoned), unchanged keys pass through. */
  def upsert(snapshot: DataFrame, changes: DataFrame, key: String,
             deleteCol: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    require(cols.contains(key), s"key $key not in snapshot")
    require(changes.columns.contains(key), s"key $key not in changes")
    require(changes.columns.contains(deleteCol),
      s"tombstone column $deleteCol not in changes")
    val s = snapshot.select(cols.map(c => col(c).as(s"_s_$c")): _*)
    // a NULL-keyed change row can match nothing — without this filter
    // it would survive the full-outer join as an orphan and emit an
    // all-NULL snapshot row (the change side drives `pick` via
    // _c_key IS NOT NULL, which a null key defeats)
    val c = changes.where(col(key).isNotNull)
      .select((cols.map(n => col(n).as(s"_c_$n")) :+
        col(deleteCol).as("_c_del")): _*)
    val inChange = col(s"_c_$key").isNotNull
    def pick(n: String): Column =
      when(inChange, col(s"_c_$n")).otherwise(col(s"_s_$n")).as(n)
    s.join(c, s(s"_s_$key") === c(s"_c_$key"), "full_outer")
      .where(!coalesce(col("_c_del"), lit(false)))
      .select(cols.map(pick): _*)
  }
}
