package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Diagnostic report sink — the engine-side analog of the reference's
  * saved figures (dataset_base.py:72-96 save_fig; the histogram
  * blocks at _objtable_methods.py:144-155). This container has no
  * plotting stack, and a 1000-executor cluster shouldn't render PNGs
  * anyway: the convention is to persist the FIGURE'S DATA LAYER —
  * the already-aggregated report frame (a14_histogram bins,
  * a16_column_profile, a19_skew_report, …) — as one
  * gzip CSV + a JSON sidecar carrying schema, row count and
  * provenance, ready for any notebook/BI renderer.
  *
  * Scale notes: report frames are aggregate-sized by construction
  * (bins/percentiles/top-k — never fact rows), so the single-file
  * `repartition(1)` write is bounded; `repartition`, not
  * `coalesce(1)`, which would collapse the UPSTREAM aggregation to
  * one task too. */
object Reports {

  /** Writes `df` under `dir/name/`: `data.csv/` (one gzip part) +
    * `meta.json`. Returns (csvDir, sidecarPath). */
  def dump(df: DataFrame, dir: String, name: String,
           provenance: String = ""): (String, String) = {
    val base = s"$dir/$name"
    val csvDir = s"$base/data.csv"
    val n = df.count()
    df.repartition(1).write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(csvDir)
    val fields = df.schema.fields.map { f =>
      s"""{"name":${q(f.name)},"type":${q(f.dataType.simpleString)}}"""
    }.mkString("[", ",", "]")
    val sidecar = s"$base/meta.json"
    val json =
      s"""{"report":${q(name)},"rows":$n,"columns":$fields,
         |"provenance":${q(provenance)}}""".stripMargin.replace("\n", "")
    Files.createDirectories(Paths.get(base))
    Files.write(Paths.get(sidecar), json.getBytes(StandardCharsets.UTF_8))
    (csvDir, sidecar)
  }

  /** Sharded fact-frame sink: the frame's natural partitioning writes
    * N gzip CSV parts in parallel, plus the same JSON sidecar carrying
    * row count, schema AND the part list — the scale path for
    * fact-sized dumps (ep2's final calibrated table), where the
    * single-file `to_csv` contract would funnel 100 TB through one
    * task. Single-file consumers keep [[dump]]; everyone else gets
    * part-parallel IO and a manifest to drive it. */
  def dumpSharded(df: DataFrame, dir: String, name: String,
                  provenance: String = ""): (String, String) = {
    val base = s"$dir/$name"
    val csvDir = s"$base/data.csv"
    df.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(csvDir)
    // Sidecar row count comes from the WRITTEN output, not a second
    // execution of the plan (ADVICE r10): a pre-write df.count() ran
    // the plan twice and could disagree with the written parts under
    // a non-deterministic plan. Reading the gzip parts back is one
    // bounded IO pass over exactly the bytes the manifest describes
    // (multiLine: quoted embedded newlines must not split rows).
    val n = df.sparkSession.read
      .option("header", "true").option("multiLine", "true").csv(csvDir)
      .count()
    val parts = {
      val d = Paths.get(csvDir)
      val it = Files.list(d).iterator()
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next().getFileName.toString
        if (f.startsWith("part-") && !f.endsWith(".crc")) buf += f
      }
      buf.sorted.toSeq
    }
    val fields = df.schema.fields.map { f =>
      s"""{"name":${q(f.name)},"type":${q(f.dataType.simpleString)}}"""
    }.mkString("[", ",", "]")
    val sidecar = s"$base/meta.json"
    val json =
      s"""{"report":${q(name)},"rows":$n,"columns":$fields,
         |"parts":${parts.map(q).mkString("[", ",", "]")},
         |"provenance":${q(provenance)}}""".stripMargin.replace("\n", "")
    Files.createDirectories(Paths.get(base))
    Files.write(Paths.get(sidecar), json.getBytes(StandardCharsets.UTF_8))
    (csvDir, sidecar)
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
