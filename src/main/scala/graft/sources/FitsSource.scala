package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDialect, Tables}
import graft.operators.FitsCodec
import graft.operators.FitsCodec.FitsCol

/** Distributed FITS ingestion — the reference's native input format,
  * loaded Spark-first (df_utils.py:11-74 fits_to_df;
  * metadata.py:106-175 load_header_meta).
  *
  * Scale shape: the driver touches exactly ONE file (to fix the
  * schema); the file LIST is the only driver-held state. Files fan
  * out over executors and each task parses its own bytes through the
  * one sanctioned mapPartitions decode seam (the [[graft.operators
  * .Multimodal]] pattern) — 100k files are 100k parallel units, and
  * column selection reaches the byte parser (unselected fields are
  * never decoded — the FITS analog of parquet column pruning). Row
  * filters compile through [[QueryDialect]] to Catalyst predicates
  * ABOVE the seam, so everything after the parse is codegen'd.
  *
  * Divergence from the reference, kept deliberately: fits_to_df drops
  * any column whose TFORM starts with a digit > 1 — including wide
  * string columns like '32A' (df_utils.py:63-64). Here rA is always a
  * scalar string; only true array columns (repeat > 1, non-A) honor
  * `keepArrayCols` — same class of reference-bug fix as C4/C5. */
object FitsSource {

  /** Sorted *.fits / *.fits.gz listing — the driver's only
    * filesystem touch. Gzipped members are inflated transparently at
    * read time ([[FitsCodec.maybeGunzip]]), like astropy. */
  def listFits(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    require(Files.isDirectory(p), s"not a directory: $dir")
    val files = Files.list(p).iterator().asScala
      .filter(f => f.toString.endsWith(".fits") || f.toString.endsWith(".fits.gz"))
      .map(_.toAbsolutePath.toString).toSeq.sorted
    require(files.nonEmpty, s"no .fits files under $dir")
    files
  }

  private def readBytes(path: String): Array[Byte] =
    FitsCodec.maybeGunzip(Files.readAllBytes(Paths.get(path)))

  private def sparkType(c: FitsCol): DataType = {
    val code = c.heap.getOrElse(c.tcode) // varlen: type of the heap elements
    val elem: DataType = code match {
      case 'L' | 'X' => BooleanType
      case 'B' | 'I' | 'J' => IntegerType
      case 'K' => LongType
      case 'E' => FloatType
      case 'D' => DoubleType
      case 'A' => StringType
      case other => throw new IllegalArgumentException(s"TFORM code $other")
    }
    if (c.isArray) ArrayType(elem, containsNull = false) else elem
  }

  /** fits_to_df column selection: exact names match directly; any
    * requested name containing '*' matches by substring of the
    * stripped pattern (df_utils.py:53-60). */
  private def selectIdx(cols: Seq[FitsCol], want: Seq[String]): Seq[Int] = {
    if (want == Seq("all")) return cols.indices
    val magic = want.filter(_.contains("*")).map(_.replace("*", ""))
    val normal = want.filterNot(_.contains("*")).toSet
    cols.indices.filter { i =>
      normal.contains(cols(i).name) || magic.exists(cols(i).name.contains)
    }
  }

  /** S2: a directory of FITS files → one DataFrame from the BINTABLE
    * at `extension` (HDU index, 1 = first extension). All files must
    * share that table's layout (names + TFORMs — checked per file,
    * clean error otherwise). */
  def readTable(spark: SparkSession, dir: String, extension: Int = 1,
                selectColumns: Seq[String] = Seq("all"),
                keepArrayCols: Boolean = false,
                selectRows: Option[String] = None,
                downcast: Boolean = false): DataFrame =
    readTableFiles(spark, listFits(dir), extension, selectColumns,
      keepArrayCols, selectRows, downcast)

  /** [[readTable]] over an explicit file list — the metadata-pruned
    * load path (files surviving a header query). */
  def readTableFiles(spark: SparkSession, files: Seq[String],
                     extension: Int = 1,
                     selectColumns: Seq[String] = Seq("all"),
                     keepArrayCols: Boolean = false,
                     selectRows: Option[String] = None,
                     downcast: Boolean = false): DataFrame = {
    require(files.nonEmpty, "empty FITS file list")
    // one driver-side read fixes the schema for the whole load
    val first = FitsCodec.hdus(readBytes(files.head))
    require(extension < first.size, s"file ${files.head} has no HDU $extension")
    val cols = FitsCodec.bintableCols(first(extension))
    val wanted = selectIdx(cols, selectColumns)
      .filter(i => keepArrayCols || !cols(i).isArray).toArray
    require(wanted.nonEmpty, s"no columns survive selection $selectColumns")
    val layout = cols.map(c => (c.name, c.tform))
    val schema = StructType(wanted.map(i =>
      StructField(cols(i).name, sparkType(cols(i)), nullable = false)))
    val enc = RowEncoder.encoderFor(schema)

    import spark.implicits._
    // only the schema file's NAME enters the task closure — never the
    // full file list (100k files would otherwise ride along with
    // every task)
    val schemaFile = files.head
    val slices = math.min(files.size, spark.sparkContext.defaultParallelism)
    var df = spark.createDataset(files).repartition(slices)
      .mapPartitions { paths =>
        paths.flatMap { path =>
          val bytes = FitsCodec.maybeGunzip(Files.readAllBytes(Paths.get(path)))
          val hs = FitsCodec.hdus(bytes)
          require(extension < hs.size, s"$path: no HDU $extension")
          val h = hs(extension)
          val fcols = FitsCodec.bintableCols(h)
          require(fcols.map(c => (c.name, c.tform)) == layout,
            s"$path: BINTABLE layout ${fcols.map(_.tform)} differs from $schemaFile")
          FitsCodec.readRows(bytes, h, wanted).map { cells =>
            Row.fromSeq(cells.toIndexedSeq.map {
              case xs: Seq[_] => xs
              case v => v
            })
          }
        }
      }(enc).toDF()
    selectRows.foreach(e => df = QueryDialect.query(df, e))
    if (downcast) df = Tables.downcast(df)
    df
  }

  /** S3: per-file header scan → one row per file: PATH + each
    * requested header key (metadata.py:146-169). Key matching is the
    * reference's: exact, or substring on the '*'-stripped pattern —
    * and the reference strips EVERY requested key for the substring
    * pass, so all keys effectively substring-match. Columns + types
    * resolve against the FIRST file's header; keys a later file lacks
    * come back null; files that fail to parse are skipped (the
    * OSError branch). */
  def readHeaders(spark: SparkSession, dir: String, headerKeys: Seq[String],
                  extension: Int = 0): DataFrame = {
    val files = listFits(dir)
    val stripped = headerKeys.map(_.replace("*", ""))
    def matching(cards: Vector[(String, Any)]): Vector[(String, Any)] =
      cards.filter { case (k, _) =>
        headerKeys.contains(k) || stripped.exists(k.contains)
      }
    val first = FitsCodec.hdus(readBytes(files.head))
    require(extension < first.size, s"file ${files.head} has no HDU $extension")
    val resolved = matching(first(extension).header)
    require(resolved.nonEmpty, s"no requested header keys $headerKeys present")
    val keyNames = resolved.map(_._1)
    val fields = StructField("PATH", StringType, nullable = false) +:
      resolved.map { case (k, v) =>
        val t = v match {
          case _: Long => LongType
          case _: Double => DoubleType
          case _: Boolean => BooleanType
          case _ => StringType
        }
        StructField(k, t, nullable = true)
      }
    val schema = StructType(fields)
    val enc = RowEncoder.encoderFor(schema)

    import spark.implicits._
    val slices = math.min(files.size, spark.sparkContext.defaultParallelism)
    spark.createDataset(files).repartition(slices)
      .mapPartitions { paths =>
        paths.flatMap { path =>
          try {
            val hs = FitsCodec.hdus(readBytes(path))
            if (extension >= hs.size) None
            else {
              val hmap = hs(extension).hmap
              Some(Row.fromSeq(path +: keyNames.map(k => hmap.get(k).orNull)))
            }
          } catch {
            // corrupted file: skip, like the reference's OSError branch
            case _: IllegalArgumentException | _: java.io.IOException => None
          }
        }
      }(enc).toDF()
  }

  /** load_header_meta's final shape: header scan + the OBSID unique
    * id = int(str(EXPID) + str(RCID)) (metadata.py:167-169). */
  def loadHeaderMeta(spark: SparkSession, dir: String,
                     headerKeys: Seq[String], extension: Int = 0): DataFrame = {
    val df = readHeaders(spark, dir, headerKeys, extension)
    require(df.columns.contains("EXPID") && df.columns.contains("RCID"),
      "OBSID derivation needs EXPID and RCID header keys")
    df.withColumn("OBSID",
      graft.functions.Photometry.compositeKey(col("EXPID"), col("RCID")))
  }

  /** The EP1 lifecycle over a FITS directory (dataset.py:143-147 on
    * the native format): header scan → metadata query → read ONLY the
    * surviving files → scan-time projection + row filter. The PATH
    * collect is driver-bounded by the file list (the same bound as
    * DatasetSession.loadObjtable). */
  def prunedLoad(spark: SparkSession, dir: String, headerKeys: Seq[String],
                 metaExpr: String,
                 selectColumns: Seq[String] = Seq("all"),
                 selectRows: Option[String] = None,
                 extension: Int = 1): DataFrame = {
    val meta = loadHeaderMeta(spark, dir, headerKeys)
    val surviving = QueryDialect.query(meta, metaExpr)
      // BOUNDED: file-path list — metadata-sized, never row data
      .select("PATH").collect().map(_.getString(0)).toSeq.sorted
    require(surviving.nonEmpty, s"no files survive the metadata query '$metaExpr'")
    readTableFiles(spark, surviving, extension, selectColumns,
      selectRows = selectRows)
  }
}
