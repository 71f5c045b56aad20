package graft

import org.apache.spark.sql.functions._

import graft.functions.Healpix
import graft.operators.Spatial

class HealpixSpec extends SparkSpec {

  private def randomSky(n: Int, seed: Int): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      // uniform on the sphere: ra uniform, dec = asin(uniform z)
      val ra = rnd.nextDouble() * 360.0
      val dec = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      (ra, dec)
    }
  }

  test("pix2ang(ang2pix) round-trips: the center maps back to its own pixel") {
    for (nside <- Seq(1, 2, 16, 256, 1024)) {
      randomSky(500, nside).foreach { case (ra, dec) =>
        val pix = Healpix.ang2pixNest(nside, ra, dec)
        assert(pix >= 0 && pix < 12L * nside * nside, s"nside=$nside pix=$pix out of range")
        val (z, phi) = Healpix.pix2zphiNest(nside, pix)
        val back = Healpix.zphi2pixNest(nside, z, phi)
        assert(back == pix, s"nside=$nside ($ra,$dec): pix=$pix center->pix=$back")
      }
    }
  }

  test("NESTED hierarchy: the child pixel at 2*nside nests under its parent") {
    for (nside <- Seq(1, 4, 64, 512)) {
      randomSky(300, 100 + nside).foreach { case (ra, dec) =>
        val parent = Healpix.ang2pixNest(nside, ra, dec)
        val child = Healpix.ang2pixNest(nside * 2, ra, dec)
        assert(child >> 2 == parent, s"nside=$nside ($ra,$dec)")
      }
    }
  }

  test("poles and wraparound land in valid pixels") {
    for (nside <- Seq(1, 16, 1024);
         (ra, dec) <- Seq((0.0, 90.0), (123.0, -90.0), (359.9999, 0.0),
           (0.0001, 0.0), (180.0, 66.7), (270.0, -66.7))) {
      val pix = Healpix.ang2pixNest(nside, ra, dec)
      assert(pix >= 0 && pix < 12L * nside * nside)
    }
  }

  test("coverDisk is a superset: any in-radius neighbor pixel is covered") {
    val rnd = new scala.util.Random(7)
    for (radiusDeg <- Seq(0.05, 0.5, 3.0)) {
      val radiusRad = math.toRadians(radiusDeg)
      val nside = Healpix.nsideFor(radiusRad)
      assert(radiusRad <= 0.5 * Healpix.pixelScaleRad(nside))
      randomSky(300, 7000 + (radiusDeg * 10).toInt).foreach { case (ra, dec) =>
        // random displacement within the radius (tangent-plane step)
        val ang = rnd.nextDouble() * 2 * math.Pi
        val r = rnd.nextDouble() * radiusRad
        val dec2 = dec + math.toDegrees(r * math.sin(ang))
        val cosd = math.max(1e-9, math.cos(math.toRadians(dec)))
        val ra2 = ra + math.toDegrees(r * math.cos(ang) / cosd)
        if (dec2 <= 90 && dec2 >= -90) {
          val pq = Healpix.ang2pixNest(nside, ((ra2 % 360) + 360) % 360, dec2)
          val cover = Healpix.coverDisk(nside,
            Healpix.ang2pixNest(nside, ra, dec), radiusRad)
          assert(cover.contains(pq),
            s"r=$radiusDeg ($ra,$dec)->($ra2,$dec2) pixel not covered")
        }
      }
    }
  }

  test("healpix NN join == chord-grid NN join on a random sky incl. poles") {
    import spark.implicits._
    val pts = randomSky(800, 42) ++ Seq((0.0, 89.999), (180.0, -89.999),
      (359.999, 0.0), (0.001, 0.0))
    val left = pts.zipWithIndex.map { case ((ra, dec), i) => (i.toLong, ra, dec) }
      .toDF("lid", "lra", "ldec")
    val cat = randomSky(150, 43).zipWithIndex.map { case ((ra, dec), i) =>
      (i.toLong, ra, dec) }.toDF("rid", "rra", "rdec")
    for (radiusDeg <- Seq(0.5, 5.0)) {
      val viaHealpix = Spatial.nnJoinSphereHealpix(
        left, "lid", "lra", "ldec", cat, "rid", "rra", "rdec", radiusDeg)
        .select("lid", "rid", "dist_deg").orderBy("lid")
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
      val viaGrid = Spatial.nnJoinSphereGrid(
        left, "lid", "lra", "ldec", cat, "rid", "rra", "rdec", radiusDeg)
        .select("lid", "rid", "dist_deg").orderBy("lid")
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
      assert(viaHealpix == viaGrid, s"radius $radiusDeg")
    }
  }

  test("healpix cell expression compiles into the plan and matches the scala fn") {
    import spark.implicits._
    val df = randomSky(200, 99).toDF("ra", "dec")
    val got = df.select(col("ra"), col("dec"),
      graft.functions.Expressions.healpixCell(col("ra"), col("dec"), 64).as("pix"))
      .as[(Double, Double, Long)].collect()
    got.foreach { case (ra, dec, pix) =>
      assert(pix == Healpix.ang2pixNest(64, ra, dec))
    }
  }
}
