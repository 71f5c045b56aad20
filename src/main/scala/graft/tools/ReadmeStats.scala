package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates README.md's Status block from the actual registry and
  * the latest bench/correctness artifacts — counts are derived, not
  * hand-typed, so they cannot go stale (VERDICT r04 #5). */
object ReadmeStats {
  def main(args: Array[String]): Unit = {
    val repo = Paths.get(if (args.nonEmpty) args(0) else ".")
    val qs = graft.Queries.all
    val nQueries = qs.size
    val nStaticOracle = qs.count(_.sql.isDefined)
    val nDynOracle = qs.count(q => q.sql.isEmpty && q.sqlGen.isDefined)
    val noOracle = qs.filter(q => q.sql.isEmpty && q.sqlGen.isEmpty).map(_.name)

    // test count: static ScalaTest `test(` registrations, with the one
    // registry-driven loop (EntrySmokeSpec: one smoke per query)
    // expanded to its real cardinality
    val testDir = repo.resolve("src/test/scala/graft")
    val nStaticTests = Files.walk(testDir).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => "(?m)^\\s*test\\(".r.findAllIn(Files.readString(p)).size)
      .sum
    val nTests = nStaticTests - 1 + nQueries

    // latest bench artifact, if any
    val bench = Files.list(repo).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("BENCH_r") && n.endsWith(".json"))
      .toSeq.sorted.lastOption
      .map { f =>
        // driver wrapper carries the bench line inside a "tail" string
        // with escaped quotes — match both raw and escaped forms
        val txt = Files.readString(repo.resolve(f))
        val total = "\\\\?\"value\\\\?\"\\s*:\\s*([0-9.]+)".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("?")
        val sf = "\\\\?\"sf\\\\?\"\\s*:\\s*\\\\?\"?([0-9.]+)".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("?")
        s"latest driver bench ($f): **$total s** total at sf=$sf, local[32], median-of-3 per query"
      }
      .getOrElse("no BENCH artifact found")

    val block =
      s"""<!-- stats:begin -->
         |- **$nQueries queries** registered in `SparkEntry.queries`
         |- **${nStaticOracle + nDynOracle} with a DuckDB oracle** ($nStaticOracle static SQL + $nDynOracle generated at Verify time); without: ${noOracle.sorted.mkString(", ")}
         |- **$nTests ScalaTest cases** under `src/test/scala/graft`
         |- $bench
         |<!-- stats:end -->""".stripMargin

    val readme = repo.resolve("README.md")
    val txt = Files.readString(readme)
    val updated = "(?s)<!-- stats:begin -->.*?<!-- stats:end -->".r
      .replaceFirstIn(txt, java.util.regex.Matcher.quoteReplacement(block))
    Files.writeString(readme, updated)
    println(block)
  }
}
