package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDialect, Tables}
import graft.operators.{Clustering, GroupOps, Joins, Outliers, Spatial}

/** EP2 — the reference's flagship notebook pipeline
  * (notebooks/dataslicer_example.ipynb cells 2-10, SURVEY §3), on the
  * TPC-H-shaped testdata:
  *
  *   load + metadata join (J1) -> preselect (P1/P2) -> cluster
  *   detections (A2 + M1) -> match clusters to the calibrator catalog
  *   (J5 = A2+J3+J2) -> select well-matched clusters (J8) ->
  *   calibrate (C2) -> IQR outlier rejection (M3).
  *
  * One lazy DataFrame lineage end-to-end; the only materialization
  * barriers are the DBSCAN label-propagation loop and the (tiny)
  * metadata/aggregate collects — exactly the barriers SURVEY §3
  * predicts. Detections are lineitem rows; "stars" are partkeys;
  * "calibrators" are suppliers on a synthetic plane.
  */
object Pipeline {

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    // EP1: sources + per-exposure metadata (broadcast join on OBSID)
    val sources = Tables.load(spark, dir, "lineitem")
    val meta = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("OBSID"), col("o_orderdate"), col("o_orderstatus"))
    val loaded = Joins.mergeMetadataToSources(
      sources.withColumn("OBSID", col("l_orderkey")),
      meta, Seq("o_orderdate", "o_orderstatus"), "OBSID")

    // P1/P2: preselection in the pandas query dialect
    val selected = QueryDialect.query(loaded,
      "l_quantity > 2 and l_returnflag in @flags", Map("flags" -> Seq("A", "N", "R")))

    // detections carry per-star sky positions with per-detection jitter
    // materialized: every downstream stage (centroids, merge-back,
    // group selection, outlier stats) re-scans this frame — projected
    // down to the columns the pipeline actually uses first
    val withCoords = selected
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_discount", "l_extendedprice", "o_orderstatus")
      .withColumn("x", ((col("l_partkey") * 17) % 2000).cast("double")
        + (col("l_linenumber") % 3) * 0.1)
      .withColumn("y", ((col("l_partkey") * 29) % 2000).cast("double")
        + (col("l_suppkey") % 3) * 0.1)
      .localCheckpoint()

    // A2: per-star centroids, then M1: DBSCAN them into sky clusters
    val centroids = GroupOps.centroids(withCoords, "l_partkey", "x", "y")
    val clustered = Clustering.dbscan(
      centroids.select(col("l_partkey"), col("x_centroid"), col("y_centroid")),
      "l_partkey", "x_centroid", "y_centroid", eps = 25.0, minSamples = 1)

    // J5: match cluster centroids to the calibrator catalog (J3 NN join)
    val calib = Tables.load(spark, dir, "supplier").select(
      col("s_suppkey"),
      ((col("s_suppkey") * 37) % 2000).as("sx"),
      ((col("s_suppkey") * 91) % 2000).as("sy"),
      (col("s_acctbal") / 1000).as("zp_ref"))
    val withCluster = centroids.join(clustered, Seq("l_partkey"))
    val matched = Spatial.nnJoinWithin(
      withCluster, "l_partkey", "x_centroid", "y_centroid",
      calib, "s_suppkey", "sx", "sy", radius = 200.0)
      .localCheckpoint()

    // J2-style merge-back onto every detection
    val merged = withCoords.join(
      matched.select(col("l_partkey"), col("cluster"), col("s_suppkey"),
        col("zp_ref"), col("dist2").as("dist2cal")),
      Seq("l_partkey"), "left")

    // J8: keep only clusters whose every member matched within radius
    val (kept, _) = GroupOps.selectGroups(merged, "cluster", col("dist2cal") <= 10000)

    // C2: calibrated magnitude against the matched calibrator
    val calibrated = kept.localCheckpoint().withColumn("cal_mag",
      graft.functions.Photometry.calMag(
        col("l_quantity"), col("zp_ref"),
        Some(col("l_discount")),
        Some(col("l_extendedprice") / 10000), Some(col("l_quantity") / 7)))

    // M3: per-cluster IQR outlier rejection on cal vs reference
    val (clean, _) = Outliers.iqrOutlierRemoval(
      calibrated, "cluster",
      col("cal_mag"), col("l_quantity") + col("zp_ref"),
      cut = 3.0, nBins = 8)

    clean.select("l_orderkey", "l_linenumber", "l_partkey", "cluster",
      "s_suppkey", "cal_mag", "norm_mag_dist", "o_orderstatus")
  }
}
