package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Jenks, Odr, Ols}

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

/** The quantile-sketch Jenks scale path: class assignments from the
  * sketch-discretized breaks must agree with the exact collected DP
  * on (nearly) every point, on a skewed distribution. */
class JenksApproxSpec extends SparkSpec {

  test("breaksApprox ~= exact breaks on a skewed 50k-value frame") {
    import spark.implicits._
    // deterministic long-tailed mixture: 90% tight cluster, 10% tail
    val values = (0 until 50000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val u = h.toDouble / Int.MaxValue
      if (i % 10 == 0) 50.0 + 450.0 * u * u else 10.0 + 5.0 * u
    }
    val df = values.toDF("v")
    val k = 5
    val exact = Jenks.breaks(values.toArray, k)
    val approx = Jenks.breaksApprox(df, "v", k)
    assert(approx.length == k + 1)
    assert(approx(0) == values.min && approx(k) == values.max)
    val agree = values.count(x =>
      Jenks.binOf(x, exact) == Jenks.binOf(x, approx))
    assert(agree.toDouble / values.size >= 0.98,
      s"only $agree/${values.size} points classed identically;" +
        s" exact=${exact.mkString(",")} approx=${approx.mkString(",")}")
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

  test("exact line has zero parameter sigmas") {
    val pts = (1 to 200).map(i => (i.toDouble, 20.0 - 0.01 * i))
    val fit = Odr.demingFit(pts.toDF("u", "z"), col("u"), col("z"))
    assert(fit.sb1 < 1e-9 && fit.sb0 < 1e-6, s"sb0=${fit.sb0} sb1=${fit.sb1}")
  }

  test("sigma estimates match the Monte-Carlo sampling spread") {
    // No scipy in this sandbox, so the fixture is the sampling
    // distribution itself: the closed-form SE(b0)/SE(b1) should match
    // the empirical sd of the estimates across replicated datasets
    // drawn from the same errors-in-both-variables model.
    val rnd = new scala.util.Random(11)
    val reps = 150
    val n = 400
    def fitOnce(): (Double, Double, Double, Double) = {
      // plain-Scala mirror of demingFit's moment math (no Spark per
      // replicate; formula identical, just without decimal rounding)
      val pts = Array.fill(n) {
        val x = rnd.nextDouble() * 10
        (x + rnd.nextGaussian() * 0.3, 5.0 + 2.0 * x + rnd.nextGaussian() * 0.3)
      }
      val ub = pts.map(_._1).sum / n; val zb = pts.map(_._2).sum / n
      val suu = pts.map(p => p._1 * p._1).sum / n - ub * ub
      val szz = pts.map(p => p._2 * p._2).sum / n - zb * zb
      val suz = pts.map(p => p._1 * p._2).sum / n - ub * zb
      val b1 = (szz - suu + math.sqrt((szz - suu) * (szz - suu) + 4 * suz * suz)) / (2 * suz)
      val sb1 = math.sqrt(b1 * b1 / (n - 2) * (suu * szz / (suz * suz) - 1.0))
      val srr = szz - 2 * b1 * suz + b1 * b1 * suu
      val sb0 = math.sqrt(srr / (n - 2) + ub * ub * sb1 * sb1)
      (zb - b1 * ub, b1, sb0, sb1)
    }
    val fits = Array.fill(reps)(fitOnce())
    def sd(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val empB1 = sd(fits.map(_._2)); val estB1 = fits.map(_._4).sum / reps
    val empB0 = sd(fits.map(_._1)); val estB0 = fits.map(_._3).sum / reps
    assert(math.abs(estB1 / empB1 - 1.0) < 0.25, s"SE(b1) est=$estB1 emp=$empB1")
    assert(math.abs(estB0 / empB0 - 1.0) < 0.25, s"SE(b0) est=$estB0 emp=$empB0")
    // and the Spark implementation returns the same closed form
    val pts = (1 to 500).map { i =>
      val x = rnd.nextDouble() * 10
      (x + rnd.nextGaussian() * 0.3, 5.0 + 2.0 * x + rnd.nextGaussian() * 0.3)
    }
    val fit = Odr.demingFit(pts.toDF("u", "z"), col("u"), col("z"))
    assert(fit.sb1 > 0 && fit.sb0 > 0)
    assert(fit.sb1 < 0.05 && fit.sb0 < 0.3) // sane scale for this noise
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

class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exact two-predictor plane with R2 = 1") {
    val pts = (1 to 300).map { i =>
      val x1 = (i % 17).toDouble; val x2 = (i % 7).toDouble
      (x1, x2, 2.0 + 3.0 * x1 - 1.5 * x2)
    }
    val fit = Ols.olsFit2(pts.toDF("x1", "x2", "y"), col("x1"), col("x2"), col("y"))
    assert(math.abs(fit.b0 - 2.0) < 1e-6, s"b0=${fit.b0}")
    assert(math.abs(fit.b1 - 3.0) < 1e-7, s"b1=${fit.b1}")
    assert(math.abs(fit.b2 - (-1.5)) < 1e-7, s"b2=${fit.b2}")
    assert(fit.r2 > 0.999999 && fit.n == 300)
  }

  test("noisy plane recovered within tolerance") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 4000).map { _ =>
      val x1 = rnd.nextDouble() * 10; val x2 = rnd.nextDouble() * 5
      (x1, x2, 1.0 + 0.5 * x1 + 2.0 * x2 + rnd.nextGaussian() * 0.1)
    }
    val fit = Ols.olsFit2(pts.toDF("x1", "x2", "y"), col("x1"), col("x2"), col("y"))
    assert(math.abs(fit.b1 - 0.5) < 0.01, s"b1=${fit.b1}")
    assert(math.abs(fit.b2 - 2.0) < 0.01, s"b2=${fit.b2}")
    assert(fit.r2 > 0.99)
  }

  test("collinear predictors: zero-det guard returns finite coefficients") {
    val pts = (1 to 100).map { i => (i.toDouble, 2.0 * i, 3.0 + i.toDouble) }
    val fit = Ols.olsFit2(pts.toDF("x1", "x2", "y"), col("x1"), col("x2"), col("y"))
    // x2 = 2*x1 exactly -> det ~ 0; decimal quantization may leave a
    // denormal-ish det, so just require finite outputs (no NaN/Inf)
    assert(!fit.b0.isNaN && !fit.b1.isNaN && !fit.b2.isNaN)
    assert(!fit.b0.isInfinite && !fit.b1.isInfinite && !fit.b2.isInfinite)
  }

  test("olsFitPerGroup: each group recovers ITS plane; tiny groups dropped") {
    val g1 = (1 to 200).map { i =>
      val x1 = (i % 13).toDouble; val x2 = (i % 5).toDouble
      ("a", x1, x2, 1.0 + 2.0 * x1 + 0.5 * x2)
    }
    val g2 = (1 to 200).map { i =>
      val x1 = (i % 11).toDouble; val x2 = (i % 6).toDouble
      ("b", x1, x2, -3.0 - 1.0 * x1 + 4.0 * x2)
    }
    val tiny = Seq(("c", 1.0, 1.0, 1.0), ("c", 2.0, 1.0, 2.0)) // n = 2 < 3
    val df = (g1 ++ g2 ++ tiny).toDF("grp", "x1", "x2", "y")
    val out = Ols.olsFitPerGroup(df, Seq("grp"), col("x1"), col("x2"), col("y"))
      .orderBy("grp").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = out(0); val b = out(1)
    assert(math.abs(a.getAs[Double]("b0") - 1.0) < 1e-6)
    assert(math.abs(a.getAs[Double]("b1") - 2.0) < 1e-7)
    assert(math.abs(a.getAs[Double]("b2") - 0.5) < 1e-7)
    assert(math.abs(b.getAs[Double]("b0") + 3.0) < 1e-6)
    assert(math.abs(b.getAs[Double]("b1") + 1.0) < 1e-7)
    assert(math.abs(b.getAs[Double]("b2") - 4.0) < 1e-7)
    assert(a.getAs[Double]("r2") > 0.999999 && b.getAs[Double]("r2") > 0.999999)
    assert(a.getAs[Long]("n") == 200 && b.getAs[Long]("n") == 200)
  }

  test("olsFitPerGroup on one group == olsFit2 bit-for-bit") {
    val pts = (1 to 300).map { i =>
      val x1 = (i % 17).toDouble; val x2 = (i % 7).toDouble
      (1, x1, x2, 2.0 + 3.0 * x1 - 1.5 * x2 + (i % 3) * 0.25)
    }
    val df = pts.toDF("grp", "x1", "x2", "y")
    val global = Ols.olsFit2(df, col("x1"), col("x2"), col("y"))
    val grouped = Ols.olsFitPerGroup(df, Seq("grp"),
      col("x1"), col("x2"), col("y")).collect()(0)
    assert(grouped.getAs[Double]("b0") == global.b0)
    assert(grouped.getAs[Double]("b1") == global.b1)
    assert(grouped.getAs[Double]("b2") == global.b2)
    assert(grouped.getAs[Double]("r2") == global.r2)
  }
}
