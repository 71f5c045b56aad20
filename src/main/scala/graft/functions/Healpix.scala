package graft.functions

/** HEALPix NESTED pixelization (Górski et al. 2005, ApJ 622, 759 —
  * the published ang2pix/pix2ang formulas; no code is derived from
  * GPL HEALPix distributions). Plays the role of the reference's
  * healpix index probe (PS1Cal_matching.py:198-200) as a compiled,
  * equal-area, pole-safe spherical cell id.
  *
  * Conventions: ra/dec in degrees; pixel = face·nside² + Morton
  * interleave of the in-face (ix, iy); nside a power of two.
  *
  * Neighborhood for radius joins: [[coverDisk]] returns every pixel
  * hit by a dense sample of the disk of radius r + 2·pixel-scale
  * around a pixel center — a superset of all pixels a radius-r match
  * can fall in when r ≤ 0.5·[[pixelScaleRad]] (HealpixSpec proves
  * equality against the 3D-chord-grid join on uniform, polar and
  * wraparound skies). Table-free by construction.
  */
object Healpix {

  /** characteristic pixel side in radians: sqrt(4π/12)/nside */
  def pixelScaleRad(nside: Int): Double = math.sqrt(math.Pi / 3.0) / nside

  /** largest power-of-two nside keeping radius ≤ 0.5·pixelScale
    * (the coverDisk correctness precondition), capped at 2^13. */
  def nsideFor(radiusRad: Double): Int = {
    var nside = 1
    while (nside < 8192 && radiusRad <= 0.5 * pixelScaleRad(nside * 2)) nside *= 2
    nside
  }

  /** spread the low 32 bits of v to even bit positions (Morton) */
  private def spreadBits(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def compactBits(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  /** ang2pix NESTED from (z = sin dec, phi = ra rad) — the published
    * equatorial/polar zone formulas. */
  def zphi2pixNest(nside: Int, z: Double, phi: Double): Long = {
    val za = math.abs(z)
    val twoPi = 2.0 * math.Pi
    val tt = {
      val p = ((phi % twoPi) + twoPi) % twoPi
      p * (2.0 / math.Pi) // in [0, 4)
    }
    var face = 0
    var ix = 0L
    var iy = 0L
    if (za <= 2.0 / 3.0) {
      // equatorial region
      val temp1 = nside * (0.5 + tt)
      val temp2 = nside * (z * 0.75)
      val jp = (temp1 - temp2).toLong // ascending-edge index
      val jm = (temp1 + temp2).toLong // descending-edge index
      val ifp = jp / nside
      val ifm = jm / nside
      face =
        if (ifp == ifm) (ifp & 3).toInt + 4
        else if (ifp < ifm) (ifp & 3).toInt
        else (ifm & 3).toInt + 8
      ix = jm & (nside - 1)
      iy = nside - (jp & (nside - 1)) - 1
    } else {
      // polar caps
      val ntt = math.min(3, tt.toInt)
      val tp = tt - ntt
      val tmp = nside * math.sqrt(3.0 * (1.0 - za))
      var jp = (tp * tmp).toLong
      var jm = ((1.0 - tp) * tmp).toLong
      if (jp >= nside) jp = nside - 1
      if (jm >= nside) jm = nside - 1
      if (z >= 0) {
        face = ntt
        ix = nside - jm - 1
        iy = nside - jp - 1
      } else {
        face = ntt + 8
        ix = jp
        iy = jm
      }
    }
    face.toLong * nside.toLong * nside.toLong + (spreadBits(ix) | (spreadBits(iy) << 1))
  }

  def ang2pixNest(nside: Int, raDeg: Double, decDeg: Double): Long =
    zphi2pixNest(nside, math.sin(math.toRadians(decDeg)), math.toRadians(raDeg))

  // face rows (jrll) and phi offsets (jpll) of the 12 base faces —
  // geometric constants from the HEALPix paper's face layout
  private val jrll = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4)
  private val jpll = Array(1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7)

  /** pixel center as (z, phi) — published pix2ang NESTED formulas. */
  def pix2zphiNest(nside: Int, pix: Long): (Double, Double) = {
    val npface = nside.toLong * nside.toLong
    val face = (pix / npface).toInt
    val t = pix % npface
    val ix = compactBits(t)
    val iy = compactBits(t >> 1)
    val jr = jrll(face).toLong * nside - ix - iy - 1 // ring index 1..4nside-1
    var nr = 0L
    var z = 0.0
    var kshift = 0L
    if (jr < nside) { // north cap
      nr = jr
      z = 1.0 - (nr * nr).toDouble / (3.0 * nside * nside)
      kshift = 0
    } else if (jr > 3L * nside) { // south cap
      nr = 4L * nside - jr
      z = -1.0 + (nr * nr).toDouble / (3.0 * nside * nside)
      kshift = 0
    } else { // equatorial belt
      nr = nside
      z = (2L * nside - jr).toDouble * 2.0 / (3.0 * nside)
      kshift = (jr - nside) & 1L
    }
    var jp = (jpll(face).toLong * nr + ix - iy + 1 + kshift) / 2
    val nl4 = 4L * nr
    if (jp > nl4) jp -= nl4
    if (jp < 1) jp += nl4
    val phi = (jp - (kshift + 1) * 0.5) * (math.Pi / (2.0 * nr))
    (z, phi)
  }

  /** All pixels a radius-`radiusRad` match around any point of `pix`
    * can fall in: sample the disk of radius radiusRad + 2·pixScale
    * around the pixel center at sub-inradius spacing and collect the
    * distinct pixel ids. Requires radiusRad ≤ 0.5·pixScale (enforce
    * via [[nsideFor]]). Intended for the dimension-sized side of a
    * join (≈10 distinct pixels from ~150 compiled samples).
    */
  def coverDisk(nside: Int, pix: Long, radiusRad: Double): Array[Long] = {
    val (z, phi) = pix2zphiNest(nside, pix)
    val scale = pixelScaleRad(nside)
    val rCover = radiusRad + 2.0 * scale
    val step = 0.25 * scale
    // local orthonormal basis at the pixel center
    val st = math.sqrt(math.max(0.0, 1.0 - z * z))
    val cx = st * math.cos(phi); val cy = st * math.sin(phi); val cz = z
    // east = d/dphi, north = d/dtheta (normalized); degenerate at the
    // exact pole — nudge handled by st floor below
    val (ex, ey, ez) =
      if (st > 1e-12) (-math.sin(phi), math.cos(phi), 0.0) else (1.0, 0.0, 0.0)
    val (nx, ny, nz) =
      if (st > 1e-12) (-z * math.cos(phi), -z * math.sin(phi), st) else (0.0, 1.0, 0.0)
    val out = new java.util.TreeSet[java.lang.Long]()
    out.add(pix)
    val nRings = math.max(1, math.ceil(rCover / step).toInt)
    var ring = 1
    while (ring <= nRings) {
      val r = ring * step
      val nSamp = math.max(8, math.ceil(2.0 * math.Pi * r / step).toInt)
      var s = 0
      while (s < nSamp) {
        val a = 2.0 * math.Pi * s / nSamp
        // tangent-plane offset, reprojected to the sphere
        val dx = r * math.cos(a); val dy = r * math.sin(a)
        var px = cx + dx * ex + dy * nx
        var py = cy + dx * ey + dy * ny
        var pz = cz + dx * ez + dy * nz
        val norm = math.sqrt(px * px + py * py + pz * pz)
        px /= norm; py /= norm; pz /= norm
        out.add(zphi2pixNest(nside, pz, math.atan2(py, px)))
        s += 1
      }
      ring += 1
    }
    val res = new Array[Long](out.size())
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    res
  }
}
