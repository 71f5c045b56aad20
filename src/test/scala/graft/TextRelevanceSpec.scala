package graft

import org.apache.spark.sql.functions._

import graft.operators.Text

/** TF-IDF / BM25 / vocabulary / stratified-sampling semantics. */
class TextRelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple", "en"),
    (2L, "banana cherry", "en"),
    (3L, "cherry cherry cherry date", "de"),
    (4L, "apple banana cherry", "de"))
    .toDF("doc_id", "text", "lang")

  test("tx_rouge_overlap == independent sequential ROUGE-2 (clipped multiset) reference") {
    // plain-Scala ROUGE-2 over the real corpus: lowercase whitespace
    // tokens (String.split == Spark's split()), bigrams WITH
    // multiplicity, clipped overlap Σ min(ca, cb) — computed with
    // none of the operator's plan machinery
    val docs = core.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    def bigrams(text: String): Seq[String] = {
      val t = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
      if (t.length <= 1) Seq(t.mkString(" "))
      else t.sliding(2).map(_.mkString(" ")).toSeq
    }
    val byId = docs.map { case (id, tx) => id -> bigrams(tx) }.toMap
    val got = SparkEntry.queries("tx_rouge_overlap")(spark, sf001)
      .select("a", "n_overlap", "total_a", "total_b", "rouge2_f1")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    var sawClip = false
    got.foreach { case (a, (ov, ta, tb, f1)) =>
      val ga = byId(a); val gb = byId(a + 1)
      val ca = ga.groupBy(identity).view.mapValues(_.size)
      val cb = gb.groupBy(identity).view.mapValues(_.size).toMap
      val refOv = ca.map { case (g, n) => math.min(n, cb.getOrElse(g, 0)) }.sum.toLong
      if (ca.exists { case (g, n) => n > 1 && cb.getOrElse(g, 0) > 0 }) sawClip = true
      assert((ov, ta, tb) == ((refOv, ga.size.toLong, gb.size.toLong)),
        s"pair $a: got ($ov,$ta,$tb) ref ($refOv,${ga.size},${gb.size})")
      val refF1 =
        if (refOv == 0) 0.0
        else {
          val r = refOv.toDouble / ga.size; val p = refOv.toDouble / gb.size
          2.0 * r * p / (r + p)
        }
      assert(f1 == refF1, s"pair $a f1: $f1 vs $refF1")
    }
    // the corpus must actually exercise the clipping path, or this
    // test can't distinguish multiset ROUGE from set intersection
    assert(sawClip, "no repeated-bigram overlap in fixture — clipping untested")
  }

  test("tx_domain_overlap == independent per-source 3-gram-set reference") {
    val docs = core.Tables.load(spark, sf001, "documents")
      .select("source", "text").as[(String, String)].collect()
    def grams(text: String): Set[String] = {
      val t = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
      if (t.length <= 2) Set(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(d => grams(d._2)).toSet).toMap
    val got = SparkEntry.queries("tx_domain_overlap")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val srcs = vocab.keys.toSeq.sorted
    assert(got.size == srcs.size * (srcs.size - 1) / 2, s"${got.size} pairs")
    for (a <- srcs; b <- srcs if a < b) {
      val (va, vb) = (vocab(a), vocab(b))
      val shared = (va & vb).size.toLong
      val (na, nb, ns, j, c) = got((a, b))
      assert((na, nb, ns) == ((va.size.toLong, vb.size.toLong, shared)),
        s"($a,$b): got ($na,$nb,$ns) ref (${va.size},${vb.size},$shared)")
      assert(j == shared.toDouble / (va.size + vb.size - shared))
      assert(c == shared.toDouble / math.min(va.size, vb.size))
    }
  }

  test("tfIdfTopK: corpus-unique term outranks ubiquitous terms") {
    val out = Text.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank_in_group").collect()
    // doc 3: 'date' appears only there -> max idf, rank 1
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.head.getString(1) == "cherry" || d3.head.getString(1) == "date")
    // 'date' tf=1/4, idf=ln(4); 'cherry' tf=3/4, idf=ln(4/3)
    val date = d3.find(_.getString(1) == "date").get
    val cherry = d3.find(_.getString(1) == "cherry").get
    assert(date.getDouble(2) > cherry.getDouble(2))
  }

  test("bm25TopK: doc with more query-term mass ranks first") {
    val out = Text.bm25TopK(docs, "doc_id", "text",
      queryTerms = Seq("cherry"), k = 4).collect()
    assert(out.head.getLong(0) == 3L) // tf=3 beats tf=1 at similar dl
    assert(out.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("vocabTopK: exact corpus and document frequencies") {
    val out = Text.vocabTopK(docs, "doc_id", "text", k = 2)
      .as[(String, Long, Long)].collect()
    // cherry: 5 occurrences in 3 docs; apple/banana: 3 occurrences each
    assert(out(0) == ("cherry", 5L, 3L))
    assert(out(1)._2 == 3L)
  }

  test("stratifiedSample: deterministic, respects per-stratum rates") {
    val n = 2000
    val big = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val out = Text.stratifiedSample(big, "doc_id", "lang",
      Seq("en" -> 100, "de" -> 500)).cache()
    val en = out.where(col("lang") === "en").count()
    val de = out.where(col("lang") === "de").count()
    // LCG buckets are near-uniform: expect ~100/1000 and ~500/1000
    assert(math.abs(en / (n / 2.0) - 0.1) < 0.05, s"en rate ${en / (n / 2.0)}")
    assert(math.abs(de / (n / 2.0) - 0.5) < 0.05, s"de rate ${de / (n / 2.0)}")
    // deterministic: same rows on rerun
    val again = Text.stratifiedSample(big, "doc_id", "lang",
      Seq("en" -> 100, "de" -> 500))
    assert(out.select("doc_id").except(again.select("doc_id")).count() == 0)
    out.unpersist()
  }

  test("balancedMix: quotas follow weights, selection is deterministic") {
    val d = (0L until 60L).map(i =>
      (i, if (i % 3 == 0) "big" else "small")).toDF("doc_id", "lang")
    // big: 20 docs, small: 40 docs; weights 1:1 -> C = 20, keep 20 each
    val out = Text.balancedMix(d, "doc_id", "lang", Seq("big" -> 1, "small" -> 1))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("big" -> 20L, "small" -> 20L))
    // weights 1:2 -> C = min(20/1, 40/2) = 20 -> quotas 20 and 40
    val out2 = Text.balancedMix(d, "doc_id", "lang", Seq("big" -> 1, "small" -> 2))
    val byLang2 = out2.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang2 == Map("big" -> 20L, "small" -> 40L))
    // deterministic: rerun keeps exactly the same doc ids
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Text.balancedMix(d, "doc_id", "lang",
      Seq("big" -> 1, "small" -> 1)).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("commonnessScore: fluent text outranks rare-token noise") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "zxqv wblat prkzn vvqx jjwz")) // tokens the corpus never repeats
      .toDF("doc_id", "text")
    val out = Text.commonnessScore(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    val scores = out.map(_.getAs[Double]("commonness"))
    assert(scores(0) > scores(2) && scores(1) > scores(2),
      s"common-word docs must outscore the rare-token doc: ${scores.toSeq}")
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(6L, 6L, 5L))
    // every token of doc 3 appears exactly once in a 17-token corpus:
    // commonness = 1e6/17, half-up-quantized to the 1e-6 grid via the
    // cross-engine floor recipe
    val expected = math.floor(1000000.0 / 17 * 1000000.0 + 0.5) / 1000000.0
    assert(math.abs(scores(2) - expected) < 1e-9, s"${scores(2)} vs $expected")
  }

  test("temperatureMix: tau=0.5 flattens the mix toward the tail, quotas exact") {
    // big: 90 docs, small: 10 docs. Natural share 90/10; sqrt share
    // sqrt(90):sqrt(10) ≈ 3:1 — the tail's share triples.
    val d = (0L until 100L).map(i =>
      (i, if (i < 90) "big" else "small")).toDF("doc_id", "lang")
    val out = Text.temperatureMix(d, "doc_id", "lang", targetFraction = 0.5)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // quotas = floor(50 * sqrt(n_d) / (sqrt(90)+sqrt(10))), naturally
    // capped at the stratum's own size (small: quota 12 > n=10 -> 10)
    val z = math.sqrt(90.0) + math.sqrt(10.0)
    assert(byLang("big") == math.floor(100 * 0.5 * math.sqrt(90.0) / z).toLong)
    assert(byLang("small") ==
      math.min(10L, math.floor(100 * 0.5 * math.sqrt(10.0) / z).toLong))
    // tail kept-rate must exceed head kept-rate (the point of tau<1)
    assert(byLang("small") / 10.0 > byLang("big") / 90.0)
    // deterministic rerun
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Text.temperatureMix(d, "doc_id", "lang", targetFraction = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // tau=1 is proportional sampling: quotas == floor(T * n_d / N)
    val prop = Text.temperatureMix(d, "doc_id", "lang", targetFraction = 0.5, tau = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(prop("big") == 45L && prop("small") == 5L)
  }

  test("packWindows: docs chunked into budget windows, spans split") {
    val d = Seq(
      (1L, "t1 t2 t3", "a"),          // 3 tokens -> [0,3)
      (2L, "t1 t2 t3 t4", "a"),       // 4 tokens -> [3,7): crosses w0|w1
      (10L, "x1 x2", "b"))            // other shard packs independently
      .toDF("doc_id", "text", "lang")
    val out = Text.packWindows(d, "doc_id", "text", "lang", budget = 5)
      .orderBy("lang", "window_id", "doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 0L, 1L, 0L, 3L),
      ("a", 0L, 2L, 3L, 5L),  // first 2 tokens of doc 2 fill window 0
      ("a", 1L, 2L, 0L, 2L),  // remaining 2 spill into window 1
      ("b", 0L, 10L, 0L, 2L)))
  }

  test("pmiCooccur: hand-computed counts and PMI, vocabulary cut respected") {
    val corpus = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a c d"), (4L, "b c"))
      .toDF("doc_id", "text")
    val out = Text.pmiCooccur(corpus, "doc_id", "text",
        vocabSize = 64, minPairDocs = 2)
      .orderBy("w1", "w2").collect()
    // doc-level pairs: (a,b)x2, (a,c)x2, (b,c)x2, (a,d)x1, (c,d)x1;
    // min 2 docs keeps three pairs, each with df=3 on both sides
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", "b", 2L), ("a", "c", 2L), ("b", "c", 2L)))
    val expected = math.floor(math.log((2.0 * 4) / (3.0 * 3.0)) * 1e6 + 0.5) / 1e6
    out.foreach(r => assert(r.getDouble(3) == expected))
    // vocabSize=2 keeps only {a, b} (df ties broken by term): one pair
    val cut = Text.pmiCooccur(corpus, "doc_id", "text",
        vocabSize = 2, minPairDocs = 2).collect()
    assert(cut.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
  }

  test("pmiCooccur: within-doc repeats count once (doc-level estimator)") {
    val corpus = Seq((1L, "x y x y x"), (2L, "x y")).toDF("doc_id", "text")
    val out = Text.pmiCooccur(corpus, "doc_id", "text",
        vocabSize = 8, minPairDocs = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("x", "y", 2L))
    // c12 = df1 = df2 = N = 2 -> pmi = ln(1) = 0 exactly
    assert(r.getDouble(3) == 0.0)
  }

  test("pretokenCount: category runs split like a BPE pretokenizer") {
    val rows = Seq(
      (1L, "hello world"),        // 2 letter runs
      (2L, "abc123def"),          // letters|digits|letters = 3
      (3L, "don't stop!"),        // don + ' + t + stop + ! = 5
      (4L, "  x  "),              // whitespace never counts = 1
      (5L, "v2.0-rc1"))           // v|2|.|0|-|rc|1 = 7
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), Text.pretokenCount(col("text")).as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 3L), (3L, 5L), (4L, 1L), (5L, 7L)))
  }

  test("madOutliers: only the far tail is flagged") {
    val d = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 100.0),
      ("h", 5.0), ("h", 5.0), ("h", 5.0))
      .toDF("k", "v")
    val out = graft.operators.Outliers.madOutliers(d, Seq("k"), col("v"), k = 3.0)
    val flagged = out.where(col("is_outlier")).select("k", "v")
      .as[(String, Double)].collect().toSet
    // g: med=3, |dev|=[2,1,0,1,97], mad=1 -> only 100 beyond 3*mad
    // h: mad=0 -> nothing beyond 0 is <= 0 ... |5-5|=0 > 0 false
    assert(flagged == Set(("g", 100.0)))
  }

  test("scrubPii: sequential redaction, specific patterns win") {
    val d = Seq(
      (1L, "mail alice.smith+x@sub.example.org now"),
      (2L, "call 555-1234 or 800-9999 ref 1234567"),
      (3L, "mixed bob@a.io and 555-0000 and 42"),
      (4L, "nothing to hide here"))
      .toDF("id", "text")
    val out = d.select(col("id") +: (Text.piiCounts(col("text")) :+
        Text.scrubPii(col("text")).as("s")): _*)
      .orderBy("id").as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 1L, 0L, 0L, "mail <EMAIL> now")))
    assert(out(1) == ((2L, 0L, 2L, 1L, "call <PHONE> or <PHONE> ref <NUM>")))
    // email is eaten first, so its digits never reach the num rule
    assert(out(2) == ((3L, 1L, 1L, 1L, "mixed <EMAIL> and <PHONE> and <NUM>")))
    assert(out(3) == ((4L, 0L, 0L, 0L, "nothing to hide here")))
  }

  test("repetition signals: hand-computed TTR / dup-ngram / top-ngram") {
    val d = Seq(
      (1L, "a a a b"),       // toks 4, distinct 2
      (2L, "x y x y x y"),   // toks 6, distinct 2
      (3L, "one two three"), // no repetition at all
      (4L, "solo"))          // shorter than n: single truncated gram
      .toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        Text.typeTokenRatio(col("text")).as("ttr"),
        Text.dupNgramFraction(col("text"), 3).as("d3"),
        Text.topNgramShare(col("text"), 2).as("t2"))
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect()
    // doc 1: g3 = [a a a, a a b] all distinct; g2 = [a a, a a, a b]
    assert(out(0) == ((1L, 0.5, 0.0, 2.0 / 3)))
    // doc 2: g3 = [x y x, y x y] x2 each -> dup 0.5; g2 top share 3/5
    assert(out(1) == ((2L, 2.0 / 6, 0.5, 3.0 / 5)))
    assert(out(2) == ((3L, 1.0, 0.0, 0.5)))
    // single-gram doc: defined, not NaN/null
    assert(out(3) == ((4L, 1.0, 0.0, 1.0)))
  }

  test("canonicalUrl: scheme/www/query/fragment/slash variants collapse") {
    val urls = Seq(
      (1L, "https://Example.com/A/b?utm_source=x"),
      (2L, "HTTP://WWW.example.com/a/B#frag"),
      (3L, "https://www.example.com/a/b/"),
      (4L, "example.com/a/b"), // schemeless passthrough
      (5L, "https://example.com/other"))
      .toDF("id", "url")
    val keys = urls.select(col("id"), Text.canonicalUrl(col("url")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1) == "example.com/a/b")
    assert(Set(keys(1), keys(2), keys(3), keys(4)).size == 1)
    assert(keys(5) == "example.com/other")
  }

  test("byUrl: keep-min-id per canonical URL with copy counts") {
    val urls = Seq(
      (7L, "https://a.com/x?q=1"),
      (3L, "http://www.a.com/x/"),
      (9L, "https://b.com/y"))
      .toDF("id", "url")
    val out = graft.operators.Dedup.byUrl(urls, "id", "url")
      .orderBy("url_key").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a.com/x" && out(0).getLong(1) == 3L
      && out(0).getLong(2) == 2L)
    assert(out(1).getString(0) == "b.com/y" && out(1).getLong(1) == 9L
      && out(1).getLong(2) == 1L)
  }

  test("fusedQualityScore: in (0,1); repetitive junk scores below diverse prose") {
    val d = Seq(
      (1L, "the cat and the dog walked to a shop of many wonders and found the thing they wanted"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam"))
      .toDF("doc_id", "text")
    val s = d.select(col("doc_id"), Text.fusedQualityScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.values.forall(v => v > 0.0 && v < 1.0))
    assert(s(1L) > s(2L))
  }
}
