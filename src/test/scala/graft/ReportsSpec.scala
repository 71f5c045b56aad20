package graft

import java.nio.file.{Files, Paths}

import graft.sources.Reports

/** The report sink: a registry report frame round-trips through the
  * csv.gz + sidecar convention with schema, row count and values
  * intact. */
class ReportsSpec extends SparkSpec {

  test("a14_histogram report dumps to csv.gz + JSON sidecar and reads back") {
    val report = SparkEntry.queries("a14_histogram")(spark, sf001)
    val dir = Files.createTempDirectory("graft_reports").toString
    val (csvDir, sidecar) = Reports.dump(report, dir, "histogram",
      provenance = s"a14_histogram @ $sf001")
    // exactly one gzip part file
    val parts = Files.list(Paths.get(csvDir)).iterator()
    var nParts = 0
    while (parts.hasNext) {
      if (parts.next().toString.endsWith(".csv.gz")) nParts += 1
    }
    assert(nParts == 1, s"expected one part file in $csvDir")
    // sidecar carries schema + rows
    val meta = Files.readString(Paths.get(sidecar))
    assert(meta.contains("\"report\":\"histogram\""), meta)
    assert(meta.contains(s"\"rows\":${report.count()}"), meta)
    report.schema.fieldNames.foreach(f => assert(meta.contains(f), f))
    // data layer round-trips (header on, values match)
    val back = spark.read.option("header", "true").csv(csvDir)
    assert(back.count() == report.count())
    assert(back.columns.toSeq == report.columns.toSeq)
  }
}
