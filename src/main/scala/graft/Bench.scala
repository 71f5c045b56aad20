package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query, median-of-3 timings
  * (single-run numbers at sf0.1 vary ±20%+ with machine load and GC —
  * the r01 bench attributed a 42s outlier to a 0.4s-warm query), one
  * JSON line with per-query medians and an explicit `errors` map. A
  * failing query can only make the bench WORSE (rc=1 + error entry),
  * never faster.
  */
object Bench {
  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warmup so the first timed query isn't inflated
    spark.range(1000000).selectExpr("sum(id)").collect()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to Runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            val msg = (e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")).replaceAll("\\s+", " ").take(200)
            errors(name) = msg
            System.err.println(s"[bench] $name FAILED: $msg")
            None
        }
      }
      val median =
        if (times.isEmpty) -1.0
        else times.sorted.apply(times.size / 2)
      name -> median
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val errJson = errors.map { case (k, v) => q(k) + ":" + q(v) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // The driver captures a bounded log TAIL (~2.3 KB): r02 lost the line's
    // FRONT (headline fields were first); r03's line simply outgrew the
    // window with 108 queries and failed to parse at all. So stdout gets ONE
    // COMPACT line — the slowest 40 queries plus an aggregate of the rest —
    // sized well under the window, headline fields still last. The complete
    // per-query map goes to bench_full.json next to the repo for humans.
    val byTime = results.toSeq.sortBy { case (_, v) => -v }
    val (top, rest) = byTime.splitAt(40)
    val qs = top.map { case (k, v) => q(k) + ":" + r3(v) }.mkString("{", ",", "}")
    val restSec = rest.map(_._2).filter(_ >= 0).sum
    val fullQs = results.map { case (k, v) => q(k) + ":" + r3(v) }.mkString("{", ",", "}")
    val full = s"""{"queries":$fullQs,"errors":$errJson,"runs":$Runs,"stat":"median","sf":"$sfDir","metric":"total","unit":"sec","value":${r3(total)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    println(s"""{"queries":$qs,"nq":${results.size},"rest_sec":${r3(restSec)},"errors":$errJson,"runs":$Runs,"stat":"median","sf":"$sfDir","metric":"total","unit":"sec","value":${r3(total)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
