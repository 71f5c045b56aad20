package graft

import org.apache.spark.sql.functions._

import graft.operators.Text

/** Bigram LM fluency score: hand-computed model on a toy corpus,
  * empty-token hygiene, partitioning invariance. */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand-computed add-0.5 bigram model") {
    // corpus: "a b a b" and "a b c". Bigram counts: (a,b)=3, (b,a)=1,
    // (b,c)=1. Context counts: a·=3, b·=2. V = 3 (a, b, c).
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Text.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    val pAB = (3 + 0.5) / (3 + 0.5 * 3) // p(b|a)
    val pBA = (1 + 0.5) / (2 + 0.5 * 3) // p(a|b)
    val pBC = (1 + 0.5) / (2 + 0.5 * 3) // p(c|b)
    def q8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 1: bigrams ab, ba, ab → contributions quantized at 1e-8 then meaned
    val d1 = q6((q8(2 * math.log(pAB)) + q8(1 * math.log(pBA))) / 3)
    val d2 = q6((q8(math.log(pAB)) + q8(math.log(pBC))) / 2)
    assert(got.toSeq == Seq((1L, 3L, d1), (2L, 2L, d2)))
  }

  test("empty split artifacts never form bigrams; short docs drop out") {
    val docs = Seq(
      (1L, "  hello   world  "), // leading/trailing/multi whitespace
      (2L, "single"),            // one token → no bigrams → no row
      (3L, "")                   // empty → no row
    ).toDF("doc_id", "text")
    val got = Text.bigramLmScore(docs, "doc_id", "text").orderBy("doc_id")
    val rows = got.as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L))
    assert(rows.head._2 == 1L) // exactly one bigram: (hello, world)
  }

  test("score is invariant to input partitioning") {
    val docs = (0L until 200L)
      .map(k => (k, s"tok${k % 7} tok${k % 5} tok${k % 3} tok${k % 7} tok${k % 5}"))
      .toDF("doc_id", "text")
    val a = Text.bigramLmScore(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Text.bigramLmScore(docs.repartition(13, col("doc_id")), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
