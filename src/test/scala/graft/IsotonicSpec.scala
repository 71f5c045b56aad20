package graft

import graft.ml.Isotonic

class IsotonicSpec extends SparkSpec {

  /** Independent O(n²) reference: the minimax characterization of
    * isotonic regression — x*_i = max_{j≤i} min_{l≥i} mean(j..l) —
    * a completely different computation from the PAVA merge loop.
    * Exact rational comparisons via BigInt cross-multiplication. */
  private def minimaxRef(grid: Seq[(Long, Long)]): Seq[(BigInt, BigInt)] = {
    val n = grid.size
    def mean(j: Int, l: Int): (BigInt, BigInt) = {
      val ks = grid.slice(j, l + 1).map(_._2).sum
      val ns = grid.slice(j, l + 1).map(_._1).sum
      (BigInt(ks), BigInt(ns))
    }
    def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)) = a._1 * b._2 < b._1 * a._2
    (0 until n).map { i =>
      (0 to i).map { j =>
        (i until n).map(l => mean(j, l)).reduce((a, b) => if (lt(a, b)) a else b)
      }.reduce((a, b) => if (lt(a, b)) b else a)
    }
  }

  test("pava == minimax characterization on random grids (exact rationals)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val grid = Seq.fill(2 + rnd.nextInt(12)) {
        val n = 1L + rnd.nextInt(50)
        (n, rnd.nextLong(n + 1))
      }
      val fit = Isotonic.pava(grid)
      val ref = minimaxRef(grid)
      fit.zip(ref).zipWithIndex.foreach { case (((fk, fn), (rk, rn)), i) =>
        assert(BigInt(fk) * rn == rk * fn,
          s"trial $trial bin $i: pava $fk/$fn vs minimax $rk/$rn on $grid")
      }
      // monotone non-decreasing
      fit.sliding(2).foreach {
        case Seq((k1, n1), (k2, n2)) =>
          assert(k1 * n2 <= k2 * n1, s"trial $trial not monotone: $fit")
        case _ =>
      }
      // mass conservation: pooled totals == input totals
      val blocks = fit.distinct
      assert(blocks.map(_._1).sum >= 0) // sanity only; spans repeat blocks
    }
  }

  test("pava hand cases: identity when monotone, global mean when fully reversed") {
    val mono = Seq((10L, 1L), (10L, 5L), (10L, 9L))
    assert(Isotonic.pava(mono) == Seq((1L, 10L), (5L, 10L), (9L, 10L)))
    val rev = Seq((10L, 9L), (10L, 5L), (10L, 1L))
    assert(Isotonic.pava(rev) == Seq.fill(3)((15L, 30L)))
    assert(Isotonic.pava(Nil).isEmpty)
  }

  test("m19_isotonic: monotone calibrated rates over occupied holdout score bins") {
    val rows = SparkEntry.queries("m19_isotonic")(spark, sf01)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 <= b._5, s"iso_rate not monotone: ${a._1}->${b._1}")
      case _ =>
    }
    // calibration preserves total label mass: Σ n·iso == Σ k (PAVA
    // block means conserve mass; doubles here are exact dyadic-free
    // rationals so allow 1e-9)
    val mass = rows.map(r => r._2 * r._5).sum
    assert(math.abs(mass - rows.map(_._3).sum) < 1e-9, s"mass $mass")
    // the scorer must actually separate: top occupied bin's raw rate
    // well above the bottom occupied bin's
    assert(rows.last._4 > rows.head._4 + 0.3,
      s"score separation too weak: ${rows.head._4} .. ${rows.last._4}")
  }
}
