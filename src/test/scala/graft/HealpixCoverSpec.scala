package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Healpix

/** The analytic disk cover (ring-walk enumeration, no sampling) must
  * EQUAL brute-force all-pixel enumeration under the same criterion —
  * centers within radius + coverPad — across nsides, radii, poles and
  * the φ-wraparound; and the ring→NESTED conversion must be a
  * bijection consistent with pix2ang. */
class HealpixCoverSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(20260814)

  test("ringPixToNest: bijection over all pixels; centers match pix2ang") {
    for (nside <- Seq(1, 2, 4, 16)) {
      val n = nside.toLong
      val npix = 12 * n * n
      val seen = scala.collection.mutable.BitSet()
      for (i <- 1L to (4 * n - 1)) {
        val npr = if (i < n) 4 * i else if (i > 3 * n) 4 * (4 * n - i) else 4 * n
        val off = if (i >= n && i <= 3 * n) (((i - n) & 1) + 1) * 0.5 else 0.5
        val sp = 2.0 * math.Pi / npr
        for (j <- 1L to npr) {
          val pix = Healpix.ringPixToNest(nside, i, j)
          assert(pix >= 0 && pix < npix, s"nside=$nside ring=$i j=$j pix=$pix")
          assert(!seen.contains(pix.toInt), s"duplicate pix $pix")
          seen += pix.toInt
          val (z, phi) = Healpix.pix2zphiNest(nside, pix)
          assert(math.abs(z - Healpix.ringZ(nside, i)) < 1e-12,
            s"nside=$nside ring=$i j=$j z=$z")
          val dphi = math.abs(phi - (j - off) * sp)
          assert(math.min(dphi, 2 * math.Pi - dphi) < 1e-9,
            s"nside=$nside ring=$i j=$j phi=$phi vs ${(j - off) * sp}")
        }
      }
      assert(seen.size == npix)
    }
  }

  test("coverDisk == brute-force center-cap enumeration (random + adversarial)") {
    def bruteforce(nside: Int, pix: Long, radius: Double): Set[Long] = {
      val npix = 12L * nside * nside
      val (z0, p0) = Healpix.pix2zphiNest(nside, pix)
      val rr = radius + Healpix.coverPadRad(nside)
      (0L until npix).filter { q =>
        val (z, p) = Healpix.pix2zphiNest(nside, q)
        Healpix.angDistRad(z, p, z0, p0) <= rr
      }.toSet + pix
    }
    def check(nside: Int, pix: Long, radius: Double): Unit = {
      val got = Healpix.coverDisk(nside, pix, radius).toSet
      val exp = bruteforce(nside, pix, radius)
      assert(got == exp,
        s"nside=$nside pix=$pix r=$radius: missing=${exp -- got} extra=${got -- exp}")
    }
    // adversarial: both poles' corner pixels, face seams, the φ wrap,
    // and nside=1 (12 giant pixels)
    check(1, 0L, 0.3)
    check(4, Healpix.ang2pixNest(4, 0.0, 89.9), 0.05)    // north pole
    check(4, Healpix.ang2pixNest(4, 180.0, -89.9), 0.05) // south pole
    check(8, Healpix.ang2pixNest(8, 359.9, 0.0), 0.05)   // φ wrap
    check(8, Healpix.ang2pixNest(8, 45.0, 41.8), 0.05)   // face seam
    // random sweep over nsides, radii up to several pixel scales,
    // uniform sky positions
    for (_ <- 1 to 40) {
      val nside = 1 << (1 + rng.nextInt(5)) // 2..32
      val ra = rng.nextDouble() * 360.0
      val dec = math.toDegrees(math.asin(2.0 * rng.nextDouble() - 1.0))
      val pix = Healpix.ang2pixNest(nside, ra, dec)
      val radius = rng.nextDouble() * 2.0 * Healpix.pixelScaleRad(nside)
      check(nside, pix, radius)
    }
  }

  test("cover stays dimension-sized at the nsideFor operating point") {
    for (_ <- 1 to 10) {
      val radius = math.toRadians(0.5 / 3600.0 * (1 + rng.nextInt(100)))
      val nside = Healpix.nsideFor(radius)
      val ra = rng.nextDouble() * 360.0
      val dec = math.toDegrees(math.asin(2.0 * rng.nextDouble() - 1.0))
      val cover = Healpix.coverDisk(nside, Healpix.ang2pixNest(nside, ra, dec), radius)
      assert(cover.nonEmpty && cover.length <= 64,
        s"cover blew up: ${cover.length} pixels at nside=$nside")
      assert(cover.toSeq == cover.toSeq.sorted)
    }
  }
}
