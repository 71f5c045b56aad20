package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Text}

/** End-to-end properties of the ep9 pre-training curation composite's
  * stage chain on a planted corpus: quality gate, boilerplate
  * removal, post-rewrite exact collapse, budget prefix. The stages'
  * exact semantics are proven in their own specs (LogRegSpec,
  * SubstringDedupSpec, DsirSimhashHamSpec); this spec wires the same
  * chain the registry query uses and checks the planted outcomes
  * survive composition. */
class Ep9CurationSpec extends SparkSpec {
  import spark.implicits._

  private def pipeline(docs: org.apache.spark.sql.DataFrame,
                       budget: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.core.Tables.spread(docs, col("doc_id"))
    val zkept = base.where(Text.fusedLinearScore(col("text")) >= 0.0)
    val rewritten = Dedup.substringDedup(zkept, "doc_id", "text", n = 4)
      .where(col("removed_fraction") < 0.5 && col("n_removed") < col("n_tokens"))
    val withSrc = rewritten.select(col("doc_id"), col("clean_text"))
      .join(base.select(col("doc_id"), col("source")), Seq("doc_id"))
    val rn = row_number().over(
      Window.partitionBy(Text.fingerprint(col("clean_text"))).orderBy(col("doc_id")))
    val uniq = withSrc.withColumn("_rn", rn).where(col("_rn") === 1)
    Text.tokenBudgetMix(uniq.select(col("doc_id"), col("source"), col("clean_text")),
      "doc_id", "clean_text", "source", budgetPerDomain = budget, nShards = 4)
  }

  test("planted outcomes survive the composed chain") {
    // bx/by: 4-token boilerplate runs, each planted in exactly two
    // docs -> duplicated -> cut by the n=4 substring rewrite. Docs 2
    // and 3 differ ONLY in which boiler they carry, so their clean
    // texts become equal -> the post-rewrite fingerprint collapse
    // keeps min id 2. All shared non-boiler runs are <= 3 tokens
    // (never covered). Doc 6 is z-negative junk (no stopwords, heavy
    // 3-gram repetition).
    val bx = "wx xx yx zx"
    val by = "wy xy yy zy"
    val docs = Seq(
      (1L, "a", "the a b1 b2 b3 of to c1 c2"),
      (2L, "a", s"the a qq $bx rr of to"),
      (3L, "a", s"the a qq $by rr of to"),
      (4L, "b", s"the a k1 k2 $bx k3 of to"),
      (5L, "b", s"the a m1 m2 $by m3 of to"),
      (6L, "b", Seq.fill(6)("xxx yyy zzz").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = pipeline(docs, budget = 10000)
      .orderBy("doc_id").as[(String, Long, Long)].collect().toSeq
    val ids = out.map(_._2).toSet
    assert(!ids.contains(6L), s"junk doc must fail the z gate: $out")
    assert(ids.contains(2L) && !ids.contains(3L),
      s"post-rewrite collapse should keep min id of {2,3}: $out")
    assert(ids.contains(1L) && ids.contains(4L) && ids.contains(5L), s"$out")
    // the boiler tokens were cut before counting: doc 2 admits its
    // 6 clean tokens, not its 10 raw ones
    assert(out.find(_._2 == 2L).get._3 == 6L, s"$out")
    assert(out.find(_._2 == 4L).get._3 == 7L, s"$out")
  }

  test("budget admission is a prefix per (source, shard) on clean text") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", s"u$i v$i w$i x$i the a of"))
      .toDF("doc_id", "source", "text")
    val out = pipeline(docs, budget = 60).as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    // every (source, shard) spends at most its shard budget (60/4=15)
    val bucketOf = docs.select(col("doc_id"),
        Text.sampleBucket(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(r => (r._1, bucketOf(r._2) % 4)).foreach { case (k, rows) =>
      assert(rows.map(_._3).sum <= 15, s"$k over budget: ${rows.toSeq}")
    }
    // and admission is a prefix of the (bucket, id) order per shard
    val admitted = out.map(_._2).toSet
    (1L to 40L).groupBy(i => (if (i % 2 == 0) "a" else "b", bucketOf(i) % 4))
      .foreach { case (_, grp) =>
        val order = grp.toSeq.sortBy(i => (bucketOf(i), i))
        val flags = order.map(admitted.contains)
        assert(!flags.dropWhile(identity).contains(true),
          s"not a prefix: $order -> $flags")
      }
  }
}
