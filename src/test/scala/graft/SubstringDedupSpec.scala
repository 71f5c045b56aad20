package graft

import graft.operators.Dedup

/** Exact-substring dedup rewrite vs an independent sequential
  * reference: planted cross-doc duplicate runs, within-doc repeats,
  * short-doc immunity, full-doc removal. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: brute-force positional n-gram counting,
    * covered-position union, order-preserving rebuild. */
  private def ref(docs: Seq[(Long, String)], n: Int)
      : Seq[(Long, String, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\s+").toSeq }
    val counts = scala.collection.mutable.Map[String, Int]()
    toks.foreach { case (_, ts) =>
      (0 to ts.length - n).foreach { i =>
        val g = ts.slice(i, i + n).mkString(" ")
        counts(g) = counts.getOrElse(g, 0) + 1
      }
    }
    toks.map { case (id, ts) =>
      val covered = scala.collection.mutable.Set[Int]()
      (0 to ts.length - n).foreach { i =>
        if (counts(ts.slice(i, i + n).mkString(" ")) > 1)
          (i until i + n).foreach(covered += _)
      }
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      val nt = ts.length.toLong
      val rem = nt - kept.length
      val frac = if (nt == 0) 0.0 else math.floor(rem.toDouble * 1e6 / nt + 0.5) / 1e6
      (id, kept.mkString(" "), nt, rem, frac)
    }.sortBy(_._1)
  }

  private def run(docs: Seq[(Long, String)], n: Int) =
    Dedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Double)].collect().toSeq

  test("matches the reference on planted cross-doc duplicate runs") {
    val boiler = "this license block repeats verbatim across many documents here"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa"),
      (3L, "unique words only nothing repeats in this one at all today"),
      (4L, s"prefix $boiler suffix $boiler tail"), // twice in one doc
      (5L, "short doc"))
    val got = run(docs, 4)
    val want = ref(docs, 4)
    assert(got == want, s"\ngot  ${got.mkString("\n     ")}\nwant ${want.mkString("\n     ")}")
    // the boilerplate really was cut from every carrier
    assert(got.filter(r => Seq(1L, 2L, 4L).contains(r._1)).forall(_._4 > 0))
    // the clean doc is untouched
    assert(got.find(_._1 == 3L).get._2 == docs(2)._2)
  }

  test("docs shorter than n are never touched; full duplicates empty out") {
    val dup = "a b c d e f g h i j"
    val docs = Seq((1L, dup), (2L, dup), (3L, "x y z"))
    val got = run(docs, 8)
    val want = ref(docs, 8)
    assert(got == want)
    assert(got.take(2).forall(r => r._2 == "" && r._5 == 1.0))
    assert(got.last._2 == "x y z" && got.last._4 == 0L)
  }

  test("overlapping duplicated grams merge into one maximal removed run") {
    // run of 6 tokens duplicated with n=4: positions 0..5 covered in
    // both docs via overlapping 4-grams (0..3, 1..4, 2..5)
    val run6 = "p q r s t u"
    val docs = Seq((1L, s"$run6 one two three four"), (2L, s"five six seven eight $run6"))
    val got = run(docs, 4)
    assert(got == ref(docs, 4))
    assert(got.head._2 == "one two three four")
    assert(got.last._2 == "five six seven eight")
  }
}
