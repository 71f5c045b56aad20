package graft

import org.apache.spark.sql.functions._

import graft.syntax._

/** The fluent extension-method surface: the reference's EP3 direct-
  * srcdf path (SURVEY §3) as one method chain, plus the training-
  * pipeline methods. */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("EP3 chain: read -> match -> solution -> calmag -> coords -> trim -> dust") {
    // a small synthetic catalog: sources on RC 14 with sky positions
    val src = (1 to 400).map { i =>
      val ra = (i % 50) * 0.01
      val dec = (i / 50) * 0.01
      (i.toLong, 14L, (i % 3000).toDouble, (i % 3000).toDouble,
        ra, dec, 15.0 + i % 10, 0.02 * (i % 5))
    }.toDF("srcid", "RCID", "xpos", "ypos", "ra", "dec", "mag", "clr")
    val cal = (0 to 60).map { j =>
      (1000L + j, (j % 8) * 0.05, (j / 8) * 0.05, 26.0 + (j % 3) * 0.1)
    }.toDF("calid", "cra", "cdec", "zp")

    val out = src
      .queryDf("mag < 25 and RCID == 14")
      .matchToCalibrators("srcid", "ra", "dec", cal, "calid", "cra", "cdec",
        radiusDeg = 0.05)
      .queryDf("calid is not null")
      .photometricSolution("g", col("mag"), col("zp") - col("mag") + col("clr"))
      .calmag("mag", "fit_zp_g", clrcoeff = Some("fit_clrcoeff_g"),
        color1 = Some("clr"), color2 = Some("clr"))
      .computeCameraCoord()
      .trimEdges("xpos", "ypos", 10, 10)
      .tagDust("srcid", "xpos", "ypos",
        Seq((1L, 100.0, 100.0, 50.0)).toDF("gid", "gx", "gy", "gr"),
        "gid", "gx", "gy", "gr")

    val rows = out.collect()
    assert(rows.nonEmpty)
    // the chain kept every appended column
    Seq("cal_mag", "fit_zp_g", "sig_fit_zp_g", "fit_clrcoeff_g",
      "sig_fit_clrcoeff_g", "cam_xpos", "cam_ypos", "gid").foreach(c =>
      assert(out.columns.contains(c), s"missing $c"))
    // RC14 at the camera origin: camera coords == local coords there
    val r0 = rows.head
    assert(r0.getAs[Double]("cam_xpos") == r0.getAs[Double]("xpos"))
    // trim really trimmed
    assert(rows.forall(r => r.getAs[Double]("xpos") > 10))
  }

  test("cluster -> select chain mirrors the notebook idiom") {
    val src = Seq(
      (1L, 0.0, 0.0, 1.0), (2L, 0.5, 0.5, 2.0), (3L, 0.4, 0.1, 30.0),
      (10L, 100.0, 100.0, 3.0), (11L, 100.2, 100.1, 4.0))
      .toDF("srcid", "x", "y", "v")
    val kept = src
      .clusterSources("srcid", "x", "y", eps = 2.0, minSamples = 1)
      .selectClusters(col("v") < 10.0)
    // cluster {1,2,3} has a violating member (v=30) -> all dropped
    assert(kept.select("srcid").as[Long].collect().toSet == Set(10L, 11L))
  }

  test("training-pipeline chain: dedup groups + split") {
    val base = "the quick brown fox jumps over the lazy dog again and again for fun"
    val docs = Seq(
      (1L, base), (2L, base.replace("lazy", "sleepy")),
      (3L, "completely different content about spark catalyst optimizer"))
      .toDF("doc_id", "text")
    val out = docs.duplicateGroups("doc_id", "text", threshold = 0.5)
      .withHashSplit("doc_id")
    assert(out.columns.toSet == Set("doc_id", "canonical_id", "is_dup", "split"))
    assert(out.where(col("is_dup")).select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(out.select("split").distinct().count() >= 1)
  }

  test("curation chain: repetition + pii + packing fluent surface") {
    val docs = Seq(
      (1L, "a a a a mail me at bob@x.io now", "en"),
      (2L, "fresh words only here", "en"),
      (3L, "otra cosa distinta aqui mismo", "es"))
      .toDF("doc_id", "text", "lang")
    val rep = docs.withRepetitionSignals("text")
    assert(rep.columns.takeRight(3).toSeq ==
      Seq("ttr", "dup_3gram_frac", "top_bigram_share"))
    val pii = docs.withPiiScrubbed("text")
    assert(pii.where(col("n_email") > 0).select("doc_id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(pii.where(col("doc_id") === 1L).select("scrubbed").as[String]
      .head().contains("<EMAIL>"))
    val packed = docs.packWindows("doc_id", "text", "lang", budget = 4)
    assert(packed.groupBy("lang").count().count() == 2)
    val mixed = docs.balancedMix("doc_id", "lang", Seq("en" -> 1, "es" -> 1))
    assert(mixed.groupBy("lang").count().as[(String, Long)].collect().toMap ==
      Map("en" -> 1L, "es" -> 1L))
  }

  test("session/graph/contract fluent surface") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 100L),
      (1L, "2024-01-01 10:10:00", 101L),
      (1L, "2024-01-01 12:00:00", 102L))
      .toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    assert(ev.sessionize("user_id", "ts", 1800, "event_id").count() == 2)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    assert(edges.pageRank(2).count() == 3)
    assert(edges.triangleStats().head.getAs[Long]("n_triangles") == 1L)
    val rep = ev.contractReport(Seq("uid_null" -> col("user_id").isNull))
    assert(rep.head.getAs[Boolean]("ok"))
    val docs = Seq((1L, "aaa bbb ccc"), (2L, "aaa bbb ccc"))
      .toDF("doc_id", "text")
    val w = docs.softDedupWeights("doc_id", "text").collect()
    assert(w.forall(_.getAs[Double]("weight") == 0.5))
  }

  test("analytics fluent surface: pmi, grouped OLS, rolling anomaly, filtered ANN") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val pmi = docs.pmiCooccur("doc_id", "text", minPairDocs = 2).collect()
    assert(pmi.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))

    val pts = (1 to 50).map(i =>
      ("g", (i % 7).toDouble, (i % 3).toDouble, 1.0 + (i % 7) * 2.0))
      .toDF("grp", "x1", "x2", "y")
    val fit = pts.olsPerGroup(Seq("grp"), col("x1"), col("x2"), col("y")).head()
    assert(math.abs(fit.getAs[Double]("b1") - 2.0) < 1e-6)

    val ev = (0 until 6).map(i =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 10:0$i:00"), i.toLong,
        if (i == 5) 99.0 else (i % 2) + 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val anom = ev.rollingAnomaly("user_id", "ts", "event_id", "value",
      window = 8, minHistory = 4).where(col("is_anomaly")).collect()
    assert(anom.map(_.getLong(2)).toSeq == Seq(5L))

    val vecs = Seq(
      (1L, Array(1f, 0f), 7), (2L, Array(0.9f, 0.1f), 7), (3L, Array(1f, 0f), 8))
      .toDF("vec_id", "embedding", "label")
    val ann = vecs.filteredTopK("vec_id", "embedding", "label", dim = 2, k = 1)
    assert(ann.collect().forall { r => // only same-label candidates appear
      Set((1L, 2L), (2L, 1L)).contains((r.getLong(0), r.getLong(1)))
    })
  }
}
