package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened like Bench (r05 post-mortem): per-query localCheckpoint
  * reclamation keeps storage flat across the 120-query suite, and a
  * stopped SparkContext is rebuilt (not cascaded) so one fatal query
  * can't zero the whole round's correctness artifact. Any query or
  * sqlGen failure is additionally recorded in `verify_errors.json`
  * next to the dumps, so a downgraded run is visible rather than
  * silently shrinking coverage (ADVICE r05). */
object Verify {
  private def newSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names for fast local
    // iteration (driver always calls with two args = full suite)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def selected(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var spark = newSession(cpus)
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    def fail(name: String, stage: String, e: Throwable): Unit = {
      val msg = (stage + ": " + e.getClass.getSimpleName + ": " +
        Option(e.getMessage).getOrElse("")).replaceAll("\\s+", " ").take(300)
      failures(name) = msg
      System.err.println(s"[verify] $name failed — $msg")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        if (spark.sparkContext.isStopped) {
          System.err.println(s"[verify] SparkContext dead before $name — rebuilding")
          spark = newSession(cpus)
        }
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable => fail(name, "query", e) }
        finally if (!spark.sparkContext.isStopped) {
          // clearCache first (r11): raw unpersist permanently disables
          // a CacheManager entry; a later query rebuilding the same
          // persisted plan would silently never cache (see Bench.reclaim)
          try spark.catalog.clearCache() catch { case _: Throwable => }
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!before.contains(id))
              try rdd.unpersist(blocking = false) catch { case _: Throwable => }
          }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static oracles + dynamically generated ones (data-derived but
    // deterministic parameters, e.g. IVF centroids for this sfDir)
    if (spark.sparkContext.isStopped) spark = newSession(cpus)
    val dynamic = Queries.all.flatMap { qq =>
      qq.sqlGen.flatMap { gen =>
        if (!selected(qq.name)) None
        else try Some(qq.name -> gen(spark, sfDir))
        catch { case e: Throwable => fail(qq.name, "sqlGen", e); None }
      }
    }.toMap
    val json = (SparkEntry.oracleSql ++ dynamic)
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} failure(s) — see $outDir/verify_errors.json")
    spark.stop()
  }
}
