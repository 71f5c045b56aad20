package graft

import graft.operators.Text

/** Full BPE merge-loop training vs an independent sequential
  * reference (list-of-symbols rewrite, not the seg-string plan):
  * greedy non-overlapping merges, lexicographic tie-breaks, merged
  * symbols re-entering later rounds. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE: vocabulary as symbol LISTS (no
    * separator-string encoding anywhere — catches framing bugs in
    * the operator's replace-based rewrite). */
  private def refBpe(corpus: Seq[String], merges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val toks = corpus.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    var vocab: Map[List[String], Long] =
      toks.groupBy(identity).map { case (t, xs) =>
        t.map(_.toString).toList -> xs.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var r = 1
    var done = false
    while (r <= merges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + f
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, rr), n) = pairs.toSeq.minBy { case ((l, rr), n) => (-n, l, rr) }
        out += ((r, l, rr, l + rr, n))
        vocab = vocab.map { case (syms, f) =>
          val res = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              res += (l + rr); i += 2 // greedy left-to-right, non-overlapping
            } else { res += syms(i); i += 1 }
          }
          res.toList -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
        r += 1
      }
    }
    out.toSeq
  }

  private def run(corpus: Seq[String], merges: Int) = {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Text.bpeTrain(df, "text", merges)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("matches the sequential reference on a corpus with re-merging symbols") {
    // "abab": merge 1 (a,b)->ab appears twice per word; merge 2 then
    // merges (ab,ab) — the merged symbol must re-enter pairing
    val corpus = Seq("abab abab cd", "abab cd cd", "ab cd")
    val got = run(corpus, 4)
    val want = refBpe(corpus, 4)
    assert(got == want, s"\ngot  $got\nwant $want")
    // and the first merge really is (a,b) with count: 2 per "abab"
    assert(got.head._2 == "a" && got.head._3 == "b")
  }

  test("greedy left-to-right non-overlap: aaa yields one merge, not two") {
    // token "aaa": pairs (a,a) count 2, but after merging the FIRST
    // occurrence the remainder is (aa, a) — non-overlapping greedy
    val corpus = Seq("aaa aaa", "aa")
    val got = run(corpus, 2)
    val want = refBpe(corpus, 2)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.head._4 == "aa")
  }

  test("ties break by (l, r) ascending at equal counts") {
    // "xy" and "yz" each appear twice -> tie at n=2, (x,y) < (y,z)
    val corpus = Seq("xy xy yz yz")
    val got = run(corpus, 1)
    assert(got == Seq((1, "x", "y", "xy", 2L)))
    assert(got == refBpe(corpus, 1))
  }

  test("merge loop stops early when no pairs remain") {
    val corpus = Seq("ab ab", "c d") // after (a,b) merge all words are single-symbol
    val got = run(corpus, 5)
    val want = refBpe(corpus, 5)
    assert(got == want)
    assert(got.size == 1)
  }

  /** Reference apply: run refBpe's merge rewrite over each token,
    * count symbols. */
  private def refApply(corpus: Seq[(Long, String)], merges: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val ms = refBpe(corpus.map(_._2), merges)
    corpus.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val nBpe = toks.map { t =>
        var syms = t.map(_.toString).toList
        ms.foreach { case (_, l, r, _, _) =>
          val res = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              res += (l + r); i += 2
            } else { res += syms(i); i += 1 }
          }
          syms = res.toList
        }
        syms.length.toLong
      }.sum
      val nChars = text.replaceAll("\\s+", "").length.toLong
      val comp =
        if (nBpe == 0) 0.0 else math.floor(nChars.toDouble * 1e6 / nBpe + 0.5) / 1e6
      (id, toks.length.toLong, nBpe, comp)
    }.sortBy(_._1)
  }

  test("bpeApply matches the reference tokenization (counts + compression)") {
    val corpus = Seq((1L, "abab abab cd"), (2L, "abab cd cd"), (3L, "ab cd"),
      (4L, "zz qq abab"), (5L, "single"))
    val got = Text.bpeApply(corpus.toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = refApply(corpus, 3)
    assert(got == want, s"\ngot  $got\nwant $want")
    // merges really compress: fewer BPE tokens than characters
    assert(got.head._3 < 10)
  }

  test("oracle SQL twin is well-formed (smoke: contains every round)") {
    val sql = Text.bpeTrainSql("""regexp_split_to_array(lower(text), '\s+')""", 3)
    (1 to 3).foreach(i => assert(sql.contains(s"b$i")))
    assert(sql.contains("chr(31)"))
  }

  test("bpeApply past merge exhaustion applies the last non-empty vocabulary") {
    // vocabulary {ab} is fully merged after round 1; rounds 2-5 run
    // dry. ADVICE r12: the SQL twin's CROSS JOIN onto an EMPTY b$i
    // emptied the vocabulary here and apply emitted (0,0,0.0) per doc
    // while this Scala side kept the round-1 vocabulary. The twin's
    // b$i is now an always-one-row min-struct aggregate (NULL when
    // dry = no-op rewrite); verified against DuckDB on this exact
    // corpus — apply (1,2,2,2.0),(2,1,1,2.0), train one row (a,b,3).
    val corpus = Seq((1L, "ab ab"), (2L, "ab"))
    val got = Text.bpeApply(corpus.toDF("doc_id", "text"), "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 2.0), (2L, 1L, 1L, 2.0)))
    assert(got == refApply(corpus, 5))
  }
}
