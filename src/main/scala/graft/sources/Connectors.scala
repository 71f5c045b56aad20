package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-catalog connector seam (the one deployment gap VERDICT r7
  * called out). The reference talks to two live services: a MongoDB
  * of PS1 calibrators keyed by HEALPix cell
  * (PS1Cal_matching.py:16-19) and the IRSA HTTP metadata service
  * (metadata.py:55-66). SURVEY §1 maps both onto parquet side tables
  * for test parity; this trait is the seam that mapping plugs into,
  * so a real deployment swaps the snapshot for a live client without
  * touching any operator.
  *
  * The scale contract is the interesting part: a connector is only
  * ever asked for the catalog slice covering a KEY SET the engine
  * computed (e.g. the distinct HEALPix cells of tonight's exposures —
  * dimension-sized by construction), never for a full dump. Lake-
  * backed connectors serve that with a distributed semi-join (keys
  * stay a DataFrame, nothing collects); remote-service connectors
  * page a bounded, driver-collected key list through batched
  * requests — and refuse key sets past their declared bound rather
  * than silently attempt a 100 TB-scale pull through a REST API.
  */
trait CatalogConnector {

  /** Connector id for diagnostics. */
  def name: String

  /** Rows of the external catalog whose `keyCol` falls in `keys`
    * (a one-column DataFrame of distinct key values). Result carries
    * the catalog's schema; duplicates in `keys` must not fan out. */
  def fetchByKeys(spark: SparkSession, keys: DataFrame, keyCol: String): DataFrame
}

/** Lake-backed connector: the catalog is a parquet snapshot (how this
  * repo models MongoDB/IRSA for parity, and how a 100 TB deployment
  * would stage a slowly-changing external catalog anyway). Fetch is a
  * broadcast LEFT SEMI join of the snapshot against the distinct key
  * frame: filters and column pruning push into the parquet scan, and
  * no key list ever materializes on the driver. */
final class ParquetSnapshotConnector(path: String) extends CatalogConnector {
  override def name: String = s"parquet:$path"

  override def fetchByKeys(spark: SparkSession, keys: DataFrame,
                           keyCol: String): DataFrame = {
    val snap = spark.read.parquet(path)
    require(snap.columns.contains(keyCol),
      s"connector $name has no key column '$keyCol' (has: ${snap.columns.mkString(", ")})")
    snap.join(broadcast(keys.select(col(keyCol)).distinct()), Seq(keyCol), "left_semi")
  }
}

/** A remote page failed after exhausting its retries. Carries the
  * completed-page state so a caller can log precisely what landed and
  * resume from `failedPageKeys ++ remaining` instead of re-pulling
  * everything (metadata.py:55-66 tolerates flaky IRSA endpoints by
  * retrying; this is the typed equivalent). */
final class ConnectorFetchException(
    val connector: String, val pagesCompleted: Int, val rowsFetched: Int,
    val failedPageKeys: Seq[Any], val attempts: Int, cause: Throwable)
  extends RuntimeException(
    s"connector $connector: page ${pagesCompleted + 1} failed after " +
      s"$attempts attempts ($rowsFetched rows over $pagesCompleted " +
      s"completed pages; ${failedPageKeys.size} keys in the failed page)",
    cause)

/** Remote-service connector shape: a batched request/response client
  * (the MongoDB `find({hpxid: {$in: batch}})` / IRSA `WHERE key IN
  * (...)` pattern). `fetchBatch` is the pluggable transport — tests
  * inject an in-memory map; production injects the driver for the
  * real service. The engine-facing guarantees:
  *
  *   - keys are collected on the DRIVER (this is inherent to calling
  *     a remote API), so the connector enforces `maxKeys` and fails
  *     fast on a key set that signals a planning bug upstream rather
  *     than melting the remote service;
  *   - requests go out in `batchSize` pages, results re-enter the
  *     cluster via `spark.createDataFrame` partitioned for the join
  *     that follows;
  *   - a failing page is retried up to `maxRetries` times with
  *     exponential backoff (backoffMs · 2^attempt — the polite-client
  *     shape for a flaky service); past that the fetch aborts with a
  *     [[ConnectorFetchException]] carrying completed-page state —
  *     never a silent partial result, which downstream joins would
  *     read as "no match";
  *   - the fetched slice is dimension-sized by the contract above, so
  *     downstream joins broadcast it (the S8/J3 calibrator shape).
  */
final class BatchedRemoteConnector[K, R](
    override val name: String,
    fetchBatch: Seq[K] => Seq[R],
    maxKeys: Int = 1000000,
    batchSize: Int = 10000,
    maxRetries: Int = 3,
    backoffMs: Long = 100L)(
    implicit kenc: org.apache.spark.sql.Encoder[K],
    renc: org.apache.spark.sql.Encoder[R]) extends CatalogConnector {

  override def fetchByKeys(spark: SparkSession, keys: DataFrame,
                           keyCol: String): DataFrame = {
    // limit(maxKeys+1).collect() bounds driver memory exactly like a
    // count()-then-collect guard but in ONE job over the distinct
    // shuffle instead of two
    val keyList = keys.select(col(keyCol)).distinct()
      // BOUNDED: limit(maxKeys + 1) — overflow raises, never grows
      .limit(maxKeys + 1).as[K](kenc).collect().toSeq
    require(keyList.size <= maxKeys,
      s"connector $name: >$maxKeys keys — a remote catalog pull must " +
        "stay dimension-sized; stage the catalog to the lake " +
        "(ParquetSnapshotConnector) for corpus-sized key sets")
    val rows = Seq.newBuilder[R]
    var rowCount = 0
    var pagesDone = 0
    keyList.grouped(batchSize).foreach { page =>
      var attempt = 0
      var fetched: Option[Seq[R]] = None
      var lastErr: Throwable = null
      while (fetched.isEmpty && attempt <= maxRetries) {
        try fetched = Some(fetchBatch(page))
        catch {
          case scala.util.control.NonFatal(e) =>
            lastErr = e
            attempt += 1
            if (attempt <= maxRetries && backoffMs > 0)
              Thread.sleep(backoffMs << math.min(attempt - 1, 10))
        }
      }
      fetched match {
        case Some(rs) =>
          rows ++= rs; rowCount += rs.size; pagesDone += 1
        case None =>
          throw new ConnectorFetchException(name, pagesDone, rowCount,
            page, attempt, lastErr)
      }
    }
    spark.createDataset(rows.result())(renc).toDF()
  }
}

/** The S8 calibrator-load flow re-expressed against the seam: compute
  * the distinct spatial cells of the detections (dimension-sized: the
  * sky footprint), pull the calibrator slice for those cells through
  * whichever connector is configured, and hand back a frame ready to
  * broadcast into the NN match ([[graft.operators.Spatial]]). */
object CalibratorSource {
  def loadForFootprint(spark: SparkSession, connector: CatalogConnector,
                       detections: DataFrame, raCol: String, decCol: String,
                       nside: Int, cellCol: String = "hpxid"): DataFrame = {
    val cells = detections.select(
      graft.functions.Expressions.healpixCell(
        col(raCol).cast("double"), col(decCol).cast("double"), nside).as(cellCol))
      .distinct()
    connector.fetchByKeys(spark, cells, cellCol)
  }
}
