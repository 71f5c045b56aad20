package graft

class PointInPolySpec extends SparkSpec {

  // the registry polygons, verbatim
  private val rings: Seq[(Int, Seq[(Int, Int)])] = Seq(
    0 -> Seq((50, 50), (200, 60), (120, 180)),
    1 -> Seq((250, 100), (450, 120), (430, 300), (260, 280)),
    2 -> Seq((60, 300), (220, 300), (220, 360), (140, 360), (140, 460), (60, 460)))

  test("j17_point_in_poly == independent java.awt.geom even-odd containment") {
    // JDK Path2D with the even-odd winding rule is a fully
    // independent ray-casting implementation — none of the query's
    // arithmetic is shared
    val paths = rings.map { case (pid, vs) =>
      val p = new java.awt.geom.Path2D.Double(
        java.awt.geom.Path2D.WIND_EVEN_ODD)
      p.moveTo(vs.head._1, vs.head._2)
      vs.tail.foreach { case (x, y) => p.lineTo(x, y) }
      p.closePath()
      pid -> p
    }
    val got = SparkEntry.queries("j17_point_in_poly")(spark, sf01)
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) -1 else r.getInt(2))
      }.toMap
    assert(got.nonEmpty)
    var insideSeen = 0
    got.foreach { case (key, (nRegions, region)) =>
      val px = (key * 17) % 500
      val py = (key * 29) % 500 + 0.5
      val ref = paths.filter(_._2.contains(px.toDouble, py))
      assert(nRegions == ref.size,
        s"key $key at ($px,$py): n_regions=$nRegions awt=${ref.map(_._1)}")
      val refRegion = if (ref.isEmpty) -1 else ref.map(_._1).min
      assert(region == refRegion, s"key $key: region=$region awt=$refRegion")
      insideSeen += nRegions.toInt
    }
    // the fixture must exercise all three polygons, incl. the concave L
    val byRegion = got.values.collect { case (_, r) if r >= 0 => r }
    assert(Set(0, 1, 2).subsetOf(byRegion.toSet),
      s"regions hit: ${byRegion.toSet}")
    assert(insideSeen > 0)
  }

  test("concave-L notch: hand-picked points prove even-odd handles the reentrant corner") {
    import org.apache.spark.sql.functions._
    // (150, 400) sits inside the L's bounding box but in the NOTCH
    // (x > 140 ∧ y > 360) — convex/bbox logic would claim it
    val df = SparkEntry.queries("j17_point_in_poly")(spark, sf01)
    // key with px=150, py=400 may not exist on the key lattice, so
    // assert via the awt reference instead: the notch point is out,
    // the arm point is in
    val l = {
      val p = new java.awt.geom.Path2D.Double(java.awt.geom.Path2D.WIND_EVEN_ODD)
      val vs = rings(2)._2
      p.moveTo(vs.head._1, vs.head._2)
      vs.tail.foreach { case (x, y) => p.lineTo(x, y) }
      p.closePath(); p
    }
    assert(!l.contains(150.0, 400.5), "notch point should be outside the L")
    assert(l.contains(100.0, 400.5), "arm point should be inside the L")
    // and the registry result flags at least one key in each arm of the L
    val inL = df.where(col("region") === 2).collect().map(_.getLong(0))
    val arms = inL.map { k => ((k * 17) % 500, (k * 29) % 500) }
    assert(arms.exists(_._2 < 360), s"no key in the horizontal arm: ${arms.take(5).toSeq}")
    assert(arms.exists(_._2 >= 360), s"no key in the vertical arm")
  }
}
