package graft

import graft.ml.LogReg

/** Trained LR quality classifier vs an independent sequential
  * reference (plain-Scala features, binning, Newton loop — no Spark
  * plans anywhere), plus a learning proof on a separable corpus and
  * the singular-Hessian guard. */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference ------------------------------------------
  private val stops = Set("the", "a", "and", "of", "to")

  private def feats(text: String): (Double, Double, Double) = {
    val toks = text.toLowerCase.split("\\s+")
    val n = toks.length.toDouble
    val stop = toks.count(stops)
    val nws = text.replaceAll("\\s+", "").length
    val q = 0.5 * (stop / n) + 0.3 * math.min(1.0, n / 100.0) +
      0.2 * math.min(1.0, (nws / n) / 5.0)
    val ttr = toks.distinct.length / n
    val g3 = (1 to math.max(toks.length - 2, 1))
      .map(i => toks.slice(i - 1, i + 2).mkString(" "))
    val dup3 = (g3.length - g3.distinct.length) / g3.length.toDouble
    val z = -2.0 + 3.0 * q + 1.5 * ttr - 2.0 * dup3 +
      0.5 * math.min(1.0, n / 200.0)
    (ttr, math.min(1.0, n / 100.0), z)
  }

  private def bucket(id: Long): Long =
    (((id % 1000000007L) * 1103515245L + 12345L) % 1000L + 1000L) % 1000L

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def dsum8(xs: Seq[Double]): Double =
    xs.map(x => BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  /** Reference end-to-end eval: same algorithm, sequential plain
    * Scala over in-memory rows. */
  private def refEval(docs: Seq[(Long, String)], iters: Int = 4,
                      nBins: Int = 16): Seq[(Int, Int, Long)] = {
    val rows = docs.map { case (id, text) =>
      val (ttr, sat, z) = feats(text)
      val u = math.min(nBins - 1, math.floor(ttr * nBins).toInt)
      val v = math.min(nBins - 1, math.floor(sat * nBins).toInt)
      (bucket(id), u, v, if (z >= 0.0) 1 else 0)
    }
    val tr = rows.filter(_._1 >= 200)
    val te = rows.filter(_._1 < 200)
    val grid = tr.groupBy(r => (r._2, r._3)).toSeq.map { case ((u, v), g) =>
      (g.size.toLong, g.map(_._4).sum.toLong, u / nBins.toDouble, v / nBins.toDouble)
    }
    var (t0, t1, t2) = (0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val cells = grid.map { case (n, k, ud, vd) =>
        val p = q6(1.0 / (1.0 + math.exp(-(t0 + t1 * ud + t2 * vd))))
        val w = n * (p * (1.0 - p)); val r = k - n * p
        (r, ud, vd, w)
      }
      val g0 = dsum8(cells.map(_._1)); val g1 = dsum8(cells.map(c => c._1 * c._2))
      val g2 = dsum8(cells.map(c => c._1 * c._3))
      val h00 = dsum8(cells.map(_._4)); val h01 = dsum8(cells.map(c => c._4 * c._2))
      val h02 = dsum8(cells.map(c => c._4 * c._3))
      val h11 = dsum8(cells.map(c => c._4 * c._2 * c._2))
      val h12 = dsum8(cells.map(c => c._4 * c._2 * c._3))
      val h22 = dsum8(cells.map(c => c._4 * c._3 * c._3))
      val m11 = h11 * h22 - h12 * h12; val m01 = h01 * h22 - h12 * h02
      val m02 = h01 * h12 - h11 * h02; val n0a = g1 * h22 - h12 * g2
      val n0b = g1 * h12 - h11 * g2; val n1c = h01 * g2 - g1 * h02
      val n2a = h11 * g2 - g1 * h12
      val det = h00 * m11 - h01 * m01 + h02 * m02
      if (det != 0.0) {
        val d0 = g0 * m11 - h01 * n0a + h02 * n0b
        val d1 = h00 * n0a - g0 * m01 + h02 * n1c
        val d2 = h00 * n2a - h01 * n1c + g0 * m02
        t0 = q6(t0 + d0 / det); t1 = q6(t1 + d1 / det); t2 = q6(t2 + d2 / det)
      }
    }
    val cm = te.groupBy { r =>
      val s = t0 + t1 * (r._2 / nBins.toDouble) + t2 * (r._3 / nBins.toDouble)
      (r._4, if (s > 0.0) 1 else 0)
    }.map { case (k, g) => k -> g.size.toLong }
    for (l <- Seq(0, 1); p <- Seq(0, 1))
      yield (l, p, cm.getOrElse((l, p), 0L))
  }

  private def mkDocs(n: Int): Seq[(Long, String)] = {
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "and", "of", "to", "a", "data", "spark", "scale", "query")
    (1 to n).map { i =>
      val len = 5 + (i * 7) % 90
      val rep = 1 + i % 4 // repetition knob -> varied ttr / dup3
      val toks = (0 until len).map(j => words((j / rep * 31 + i) % words.size))
      (i.toLong, toks.mkString(" "))
    }
  }

  test("matches the sequential reference end-to-end (thetas + confusion)") {
    val docs = mkDocs(400)
    val got = LogReg.lrQualityEval(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("label", "label_pred")
      .as[(Int, Int, Long)].collect().toSeq
    val want = refEval(docs)
    assert(got == want, s"\ngot  $got\nwant $want")
    // both classes present and the holdout is non-empty
    assert(want.map(_._3).sum > 0)
  }

  test("learns on a separable corpus (labels derived from the text)") {
    val docs = mkDocs(600)
    val cm = LogReg.lrQualityEval(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Int, Int, Long)].collect().toSeq.map(r => (r._1, r._2) -> r._3).toMap
    val correct = cm((0, 0)) + cm((1, 1))
    val total = cm.values.sum
    assert(total > 0)
    // the label is a function of signals overlapping the features:
    // a trained model must beat the majority prior by a margin
    val majority = math.max(cm((0, 0)) + cm((0, 1)), cm((1, 0)) + cm((1, 1)))
    assert(correct > majority,
      s"accuracy $correct/$total not above majority prior $majority/$total")
  }

  test("singular Hessian (single-cell grid) keeps theta at zero") {
    val grid = Seq((10L, 5L, 0.5, 0.5)).toDF("n", "k", "ud", "vd")
    val th = LogReg.irlsFit(grid, iters = 3)
    assert(th == LogReg.Theta(0.0, 0.0, 0.0))
  }
}
