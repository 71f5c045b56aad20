package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Jenks, Odr}

class JenksSpec extends AnyFunSuite {

  /** Brute-force optimal k-partition by enumerating all split points. */
  private def bruteBest(values: Array[Double], k: Int): Double = {
    val v = values.sorted
    def ssd(lo: Int, hi: Int): Double = {
      val s = v.slice(lo, hi)
      val m = s.sum / s.length
      s.map(x => (x - m) * (x - m)).sum
    }
    def go(start: Int, classesLeft: Int): Double =
      if (classesLeft == 1) ssd(start, v.length)
      else (start + 1 to v.length - classesLeft + 1).map { mid =>
        ssd(start, mid) + go(mid, classesLeft - 1)
      }.min
    go(0, k)
  }

  private def totalSsd(values: Array[Double], edges: Array[Double]): Double = {
    val groups = values.groupBy(x => Jenks.binOf(x, edges)).values
    groups.map { g =>
      val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum
    }.sum
  }

  test("known textbook example") {
    // jenkspy docs example
    val v = Array(1.3, 7.1, 7.3, 2.3, 3.9, 4.1, 7.8, 1.2, 4.3, 7.3, 5.0, 4.3)
    val b = Jenks.breaks(v, 3)
    assert(b.head == 1.2 && b.last == 7.8)
    assert(b.length == 4)
    assert(math.abs(totalSsd(v, b) - bruteBest(v, 3)) < 1e-9)
  }

  test("optimal SSD on random inputs vs exhaustive search") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val v = Array.fill(14)(rnd.nextDouble() * 100)
      val k = 2 + trial % 3
      val edges = Jenks.breaks(v, k)
      assert(math.abs(totalSsd(v, edges) - bruteBest(v, k)) < 1e-6,
        s"trial $trial: ${v.mkString(",")} k=$k")
    }
  }

  test("clearly separated groups split at the gaps") {
    val v = Array(1.0, 1.1, 1.2, 50.0, 50.1, 50.2, 100.0, 100.1)
    val b = Jenks.breaks(v, 3)
    assert(b(1) == 1.2 && b(2) == 50.2)
  }

  test("binOf respects include_lowest and edge inclusivity") {
    val edges = Array(0.0, 10.0, 20.0, 30.0)
    assert(Jenks.binOf(0.0, edges) == 0)   // include_lowest
    assert(Jenks.binOf(10.0, edges) == 0)  // right-inclusive bins
    assert(Jenks.binOf(10.5, edges) == 1)
    assert(Jenks.binOf(30.0, edges) == 2)
  }
}

class OdrSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exact linear relationship") {
    val pts = (1 to 200).map(i => (i.toDouble, 20.0 - 0.01 * i))
    val df = pts.toDF("u", "z")
    val fit = Odr.demingFit(df, col("u"), col("z"))
    assert(math.abs(fit.b1 - (-0.01)) < 1e-9)
    assert(math.abs(fit.b0 - 20.0) < 1e-7)
    assert(fit.n == 200)
  }

  test("noisy line recovered within tolerance") {
    val rnd = new scala.util.Random(3)
    val pts = (1 to 2000).map { i =>
      val x = rnd.nextDouble() * 10
      (x + rnd.nextGaussian() * 0.05, 5.0 + 2.0 * x + rnd.nextGaussian() * 0.05)
    }
    val fit = Odr.demingFit(pts.toDF("u", "z"), col("u"), col("z"))
    assert(math.abs(fit.b1 - 2.0) < 0.02, s"b1=${fit.b1}")
    assert(math.abs(fit.b0 - 5.0) < 0.1, s"b0=${fit.b0}")
  }

  test("deming symmetry: slope of inverse relation is reciprocal") {
    val rnd = new scala.util.Random(5)
    val pts = (1 to 1000).map { i =>
      val x = rnd.nextDouble() * 10
      (x + rnd.nextGaussian() * 0.1, 3.0 * x + rnd.nextGaussian() * 0.1)
    }
    val fwd = Odr.demingFit(pts.toDF("u", "z"), col("u"), col("z"), delta = 1.0)
    val inv = Odr.demingFit(pts.map(p => (p._2, p._1)).toDF("u", "z"), col("u"), col("z"), delta = 1.0)
    assert(math.abs(fwd.b1 * inv.b1 - 1.0) < 0.01)
  }
}
