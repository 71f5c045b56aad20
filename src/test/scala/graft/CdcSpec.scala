package graft

import graft.operators.Dedup

/** Content-defined chunking vs a sequential reference, plus the
  * property that justifies CDC over fixed windows: chunk boundaries
  * re-sync after an insertion, so a shifted copy still dedups. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val P = graft.functions.Expressions.PolyP

  /** Sequential reference chunker — same boundary rule, plain loop. */
  private def refChunks(text: String, w: Int = 16, d: Int = 64): Seq[String] = {
    val t = text.toLowerCase
    val bounds = scala.collection.mutable.ArrayBuffer[Int](0)
    for (i <- w to t.length) {
      var h = 0L
      for (j <- (i - w) until i) h = (h * 31 + t.charAt(j)) % P
      if (h % d == 0) bounds += i
    }
    if (bounds.last != t.length) bounds += t.length
    val bs: Seq[Int] = bounds.distinct.sorted.toSeq
    bs.zip(bs.drop(1)).collect { case (s, e) if e > s => t.substring(s, e) }
  }

  test("chunks match the sequential reference") {
    val rng = new scala.util.Random(20260816)
    val docs = (1L to 30L).map { i =>
      val len = 5 + rng.nextInt(400)
      (i, (0 until len).map(_ => ('a' + rng.nextInt(27)).toChar)
        .mkString.replace('{', ' '))
    }
    val got = Dedup.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
    docs.foreach { case (id, text) =>
      val want = refChunks(text)
      assert(got.getOrElse(id, Seq.empty) == want,
        s"doc $id:\ngot  ${got.get(id)}\nwant $want")
      // chunk lengths returned match the texts
    }
  }

  test("boundaries re-sync after a prefix insertion (the CDC property)") {
    val rng = new scala.util.Random(7)
    val body = (0 until 3000).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val docs = Seq((1L, body), (2L, "inserted prefix " + body))
      .toDF("doc_id", "text")
    val rep = Dedup.cdcDedup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    // doc 1 is entirely contained in doc 2 with a shifted offset; CDC
    // must still find most bytes duplicated (fixed windows would find
    // none) — require > 80% dedup on the original
    val r1 = rep.find(_._1 == 1L).get
    assert(r1._5 > 0.8, s"resync failed: $r1")
    val r2 = rep.find(_._1 == 2L).get
    assert(r2._4 >= r1._4 - 64, s"shifted copy should share the chunks: $rep")
  }

  test("degenerate inputs: empty, shorter than window, no boundaries") {
    val docs = Seq((1L, ""), (2L, "short"), (3L, "x" * 40)).toDF("doc_id", "text")
    val rep = Dedup.cdcDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Double)].collect()
    assert(rep(0) == ((1L, 0L, 0L, 0L, 0.0)))
    assert(rep(1)._2 == 1L && rep(1)._3 == 5L) // one whole-doc chunk
    assert(rep(2)._2 >= 1L)
    // and the chunk texts reassemble the doc
    val ch = Dedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").as[(Long, Int, Long, String)].collect()
    assert(ch.filter(_._1 == 3L).map(_._4).mkString == "x" * 40)
  }
}
