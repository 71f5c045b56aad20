package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide source tripwire, companion to CheckpointAuditSpec: a
  * driver-side `collect()` in OPERATOR code is only acceptable when
  * the collected frame is bounded by construction — a single-row
  * aggregate, a `limit(n)`, a metadata/file list, or an explicit
  * driver-bound guard (the CC union-find's edge-count gate). An
  * unbounded collect is the classic distributed-in-name-only failure:
  * it works at test scale and OOMs the driver at 100 TB.
  *
  * Enforcement: every `.collect()` call under the audited source
  * trees must carry a `BOUNDED:` justification comment within the
  * preceding lines. New unjustified collects fail here until their
  * author writes down what bounds them. Harness mains (Bench, Verify,
  * tools) are exempt — they collect their own reports by design.
  */
class CollectAuditSpec extends AnyFunSuite {

  private val auditedRoots = Seq(
    "src/main/scala/graft/operators", "src/main/scala/graft/ml",
    "src/main/scala/graft/sources", "src/main/scala/graft/functions",
    "src/main/scala/graft/core", "src/main/scala/graft/streaming")

  private def scalaFiles(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
    else if (f.getName.endsWith(".scala")) Seq(f)
    else Seq.empty

  private val MarkerWindow = 6

  test("every operator-code collect() carries a BOUNDED justification") {
    val offenders = for {
      root <- auditedRoots
      file <- scalaFiles(new java.io.File(root))
      src = {
        val s = scala.io.Source.fromFile(file, "UTF-8")
        try s.getLines().toVector finally s.close()
      }
      (line, i) <- src.zipWithIndex
      if line.contains(".collect()")
      if !line.trim.startsWith("*") && !line.trim.startsWith("//")
      window = src.slice(math.max(0, i - MarkerWindow), i + 1)
      if !window.exists(_.contains("BOUNDED:"))
    } yield s"${file.getPath}:${i + 1}"
    assert(offenders.isEmpty,
      s"\nunjustified collect() call sites (add a `// BOUNDED: <what bounds the frame>` " +
        s"comment within $MarkerWindow lines, or keep the computation distributed):\n  " +
        offenders.mkString("\n  "))
  }
}
