package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational join operators from the reference (SURVEY §2.3). */
object Joins {

  /** J1: metadata ⋈ sources inner equi-join (dataset.py:206-246
    * merge_metadata_to_sources): project the requested metadata
    * columns (wildcard-aware) plus the join key, then broadcast-join
    * onto the source table — metadata is one row per file, always the
    * small side.
    */
  def mergeMetadataToSources(sources: DataFrame, metadata: DataFrame,
                             metadataCols: Seq[String], joinOn: String): DataFrame = {
    Tables.requireCols(sources, Seq(joinOn))
    Tables.requireCols(metadata, Seq(joinOn))
    val meta = Tables.wildcardSelect(metadata, metadataCols :+ joinOn)
    sources.join(broadcast(meta), joinOn)
  }

  /** J2: left join attaching counterpart columns under a suffix
    * (_objtable_methods.py:97-99, :131-133: pandas suffixes=['','_ps1']).
    * Non-key right columns colliding with left names get `suffix`.
    */
  def suffixJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                 suffix: String, joinType: String = "left"): DataFrame = {
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      if (!on.contains(c) && left.columns.contains(c))
        df.withColumnRenamed(c, c + suffix)
      else df
    }
    left.join(renamed, on, joinType)
  }

  /** J6: IRSA-style side-table join (metadata.py:81-84): dedup the
    * remote table first to avoid row blowup, then inner equi-join.
    * `broadcastSide = true` suits the reference's case (metadata
    * fetched only for the EXPIDs in the query — always small); pass
    * false for fact-sized side tables and let AQE pick the shuffle
    * strategy.
    */
  def dedupJoin(df: DataFrame, side: DataFrame, on: Seq[String],
                broadcastSide: Boolean = true): DataFrame = {
    val deduped = side.dropDuplicates()
    df.join(if (broadcastSide) broadcast(deduped) else deduped, on)
  }
}
