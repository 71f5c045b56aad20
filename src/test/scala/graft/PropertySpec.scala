package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{QueryDialect, Tables}
import graft.functions.{Coords, Photometry}
import graft.operators.GroupOps

/** SURVEY §5.3 property tests. Spark-free properties run per
  * generated sample; DataFrame properties run on bounded samples.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** Deterministic generator sampling (scalatest/scalacheck bridge is
    * not on the offline classpath). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("C2: zero color coefficient => cal - mag == zp (closed form)") {
    val g = for {
      mag <- Gen.chooseNum(-30.0, 30.0); zp <- Gen.chooseNum(-5.0, 5.0)
      c1 <- Gen.chooseNum(-2.0, 2.0); c2 <- Gen.chooseNum(-2.0, 2.0)
    } yield (mag, zp, c1, c2)
    val rows = samples(g, 50)
    val df = rows.map { case (m, z, c1, c2) => (m, z, 0.0, c1, c2) }
      .toDF("m", "z", "cc", "c1", "c2")
    val out = df.select(col("m"), col("z"), Photometry.calMag(col("m"), col("z"),
      Some(col("cc")), Some(col("c1")), Some(col("c2"))).as("cal")).collect()
    out.foreach(r => assert(r.getDouble(2) == r.getDouble(0) + r.getDouble(1)))
  }

  test("QueryDialect: chained comparison == explicit conjunction on random bounds") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem").cache()
    samples(Gen.zip(Gen.chooseNum(1, 49), Gen.chooseNum(1, 49)), 8).foreach {
      case (a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val chained = QueryDialect.query(li, s"$lo <= l_quantity < $hi").count()
        val explicit = li.where(col("l_quantity") >= lo && col("l_quantity") < hi).count()
        assert(chained == explicit)
    }
  }

  test("P8: trim partitions input; kept box is strictly inside") {
    val pts = (1L to 500L).map(i => (i, (i * 37) % 3500, (i * 91) % 3500))
      .toDF("id", "x", "y")
    samples(Gen.chooseNum(1, 1500), 5).foreach { d =>
      val (keep, rej) = Coords.trimEdges(pts, "x", "y", d, d)
      assert(keep.count() + rej.count() == 500)
      assert(keep.where(col("x") <= d || col("y") <= d).count() == 0)
    }
  }

  test("J8: every surviving group satisfies the condition on all members") {
    val df = (1L to 300L).map(i => (i % 40, (i * 13) % 100)).toDF("g", "v")
    samples(Gen.chooseNum(5, 95), 5).foreach { cut =>
      val (kept, dropped) = GroupOps.selectGroups(df, "g", col("v") < cut)
      assert(kept.where(col("v") >= cut).count() == 0)
      assert(kept.count() + dropped.count() == 300)
      // dropped groups each contain at least one violator
      val badGroups = df.where(col("v") >= cut).select("g").distinct().count()
      assert(dropped.select("g").distinct().count() == badGroups)
    }
  }

  test("U2: subtract(a, a) is empty; subtract(a, empty) == a") {
    val a = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus")
    assert(Tables.subtract(a, a).count() == 0)
    assert(Tables.subtract(a, a.limit(0)).count() == a.count())
  }

  test("jaccard bounds and identity") {
    samples(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")), 10).foreach {
      words =>
        val t = words.mkString(" ")
        val df = Seq((t, t)).toDF("x", "y")
        // jaccard is defined on distinct-element sets
        val j = df.select(graft.operators.Text.jaccard(
          array_distinct(graft.operators.Text.tokens(col("x"))),
          array_distinct(graft.operators.Text.tokens(col("y"))))).head().getDouble(0)
        assert(j == 1.0)
    }
  }

  test("hashSplit: proportions track per-mille targets and are id-deterministic") {
    import graft.operators.Text
    val ids = (0L until 20000L).toDF("id")
    val counts = ids.select(Text.hashSplit(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 16000L) < 800, counts.toString) // ±5%
    assert(math.abs(counts("val") - 2000L) < 400)
    assert(math.abs(counts("test") - 2000L) < 400)
    // stable under reshuffling: split depends on the id alone
    val a = ids.select(col("id"), Text.hashSplit(col("id")).as("s"))
    val b = ids.orderBy(col("id").desc).repartition(7)
      .select(col("id"), Text.hashSplit(col("id")).as("s2"))
    assert(a.join(b, "id").where(col("s") =!= col("s2")).count() == 0)
  }

  test("healpix pixels are equal-area: uniform sky gives near-uniform occupancy") {
    import graft.functions.Healpix
    val rnd = new scala.util.Random(6)
    val nside = 8
    val n = 60000
    val occ = new scala.collection.mutable.HashMap[Long, Int]().withDefaultValue(0)
    (0 until n).foreach { _ =>
      val ra = rnd.nextDouble() * 360
      val dec = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      occ(Healpix.ang2pixNest(nside, ra, dec)) += 1
    }
    val npix = 12 * nside * nside
    assert(occ.size == npix, s"only ${occ.size} of $npix pixels hit")
    val mean = n.toDouble / npix // ~78 per pixel
    // equal-area => Poisson spread only: every pixel within ±6 sigma
    val bound = 6 * math.sqrt(mean)
    occ.values.foreach(c => assert(math.abs(c - mean) < bound, s"occupancy $c vs $mean"))
  }

  test("composite key: parse(concat(a,b)) round-trips through strings") {
    val pairs = samples(Gen.zip(Gen.chooseNum(1L, 999999L), Gen.chooseNum(0, 99)), 30)
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Photometry.compositeKey(col("a"), col("b")).as("k"))
      .collect()
    out.foreach(r => assert(r.getLong(2).toString == s"${r.getLong(0)}${r.getInt(1)}"))
  }

  test("epochMix: emitted copies are exactly floor(w)*n + per-mille remainder picks") {
    import graft.operators.Text
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "src")
    val out = Text.epochMix(df, "doc_id", "src", Seq("a" -> 2.25, "b" -> 0.5))
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // stratum a: 1000 docs, 2 copies each + the docs whose LCG bucket
    // < 250; stratum b: 0 copies + bucket < 500 picks — recompute the
    // expected counts from the same deterministic bucket
    def picks(src: String, cut: Int): Long = df
      .where(col("src") === src &&
        Text.sampleBucket(col("doc_id")) < cut).count()
    assert(counts("a") == 2L * 1000L + picks("a", 250))
    assert(counts("b") == picks("b", 500))
    // realized epochs track the weights at per-mille resolution
    assert(math.abs(counts("a") / 1000.0 - 2.25) < 0.05)
    assert(math.abs(counts("b") / 1000.0 - 0.5) < 0.05)
    // copy_idx is dense 1..n per doc
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("m"))
      .where(col("n") =!= col("m")).count()
    assert(bad == 0L)
  }

  test("packWindows: token mass conserved; every non-final window full") {
    import graft.operators.Text
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val budget = 512
    val packed = Text.packWindows(docs, "doc_id", "text", "lang", budget)
      .localCheckpoint()
    // (1) conservation: each doc's window slices sum to its token count
    val perDoc = packed.groupBy("doc_id")
      .agg(sum(col("end_in_window") - col("start_in_window")).as("mass"))
    val toks = docs.select(col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_toks"))
    assert(perDoc.join(toks, "doc_id")
      .where(col("mass") =!= col("n_toks")).count() == 0)
    // (2) chunking: within each lang, every window except the last is
    // exactly full (concat-and-chunk leaves no internal gaps)
    val fills = packed.groupBy("lang", "window_id")
      .agg(sum(col("end_in_window") - col("start_in_window")).as("fill"))
    val lastW = fills.groupBy("lang").agg(max("window_id").as("last_w"))
    val nonFinal = fills.join(lastW, "lang")
      .where(col("window_id") < col("last_w"))
    assert(nonFinal.where(col("fill") =!= budget).count() == 0)
    assert(nonFinal.count() > 0) // the invariant actually bit on data
  }

  test("packReport: waste bounded by one window, mass conserved, fill consistent") {
    import graft.operators.Text
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val budget = 512
    val rep = Text.packReport(docs, "doc_id", "text", "lang", budget).collect()
    assert(rep.nonEmpty)
    val totalToks = docs
      .agg(sum(Text.tokenCount(col("text")).cast("long"))).head.getLong(0)
    assert(rep.map(_.getAs[Long]("token_mass")).sum == totalToks)
    rep.foreach { r =>
      // only the final window of a shard may be partial
      assert(r.getAs[Long]("tail_waste") >= 0 && r.getAs[Long]("tail_waste") < budget)
      val f = r.getAs[Double]("fill_frac")
      assert(f > 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_windows") * budget ==
        r.getAs[Long]("token_mass") + r.getAs[Long]("tail_waste"))
    }
  }

  test("balancedMix: achieved mix matches quotas exactly at sf0.001") {
    import graft.operators.Text
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w = Seq("en" -> 3, "de" -> 2, "es" -> 2, "fr" -> 2, "zh" -> 1)
    val counts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val ratios: Seq[Double] = w.map { case (l, wt) => counts(l).toDouble / wt }
    val c = ratios.min
    val expected = w.map { case (l, wt) => l -> math.floor(c * wt).toLong }.toMap
    val got = Text.balancedMix(docs, "doc_id", "lang", w)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("nearestJoin == brute-force nearest on random timestamps (ties: past, max id)") {
    import graft.operators.Temporal
    // deterministic pseudo-random micro-timestamps with deliberate
    // collisions (mod 50) so the tie rules are actually exercised
    def h(i: Long): Long = (i * 2654435761L) & 0x7fffffffL
    val leftRows = (0 until 300).map { i =>
      (i.toLong, (i % 7).toLong, new java.sql.Timestamp((h(i) % 50) * 1000L))
    }
    val rightRows = (0 until 200).map { i =>
      (1000L + i, (i % 7).toLong, new java.sql.Timestamp((h(i + 31) % 50) * 1000L))
    }
    val l = leftRows.toDF("event_id", "user_id", "ts")
    val r = rightRows.toDF("event_id", "user_id", "ts")
    val got = Temporal.nearestJoin(l, r, "user_id", "ts", "event_id")
      .collect()
      .map(row => (row.getLong(0), Option(row.getAs[java.lang.Long]("event_id_n")).map(_.toLong)))
      .toMap
    assert(got.size == leftRows.size)
    leftRows.foreach { case (lid, lu, lts) =>
      val cands = rightRows.filter(_._2 == lu)
      val expected =
        if (cands.isEmpty) None
        else {
          val minDiff = cands.map(c => math.abs(c._3.getTime - lts.getTime)).min
          val best = cands.filter(c => math.abs(c._3.getTime - lts.getTime) == minDiff)
          // tie: prefer past (ts <= lts); within a side, largest id
          val past = best.filter(_._3.getTime <= lts.getTime)
          val pool = if (past.nonEmpty) past else best
          Some(pool.map(_._1).max)
        }
      assert(got(lid) == expected,
        s"left $lid ($lu @ ${lts.getTime}): got ${got(lid)}, expected $expected")
    }
  }

  test("asofJoin == brute-force latest-at-or-before on random timestamps") {
    import graft.operators.Temporal
    def h(i: Long): Long = (i * 2654435761L) & 0x7fffffffL
    val leftRows = (0 until 250).map { i =>
      (i.toLong, (i % 5).toLong, new java.sql.Timestamp((h(i) % 40) * 1000L))
    }
    val rightRows = (0 until 180).map { i =>
      (1000L + i, (i % 5).toLong, new java.sql.Timestamp((h(i + 13) % 40) * 1000L))
    }
    val l = leftRows.toDF("event_id", "user_id", "ts")
    val r = rightRows.toDF("event_id", "user_id", "ts")
    val got = Temporal.asofJoin(l, r, "user_id", "ts",
        payload = Seq("event_id"), tieBreak = "event_id")
      .collect()
      .map(row => (row.getLong(0), Option(row.getAs[java.lang.Long]("event_id_r")).map(_.toLong)))
      .toMap
    assert(got.size == leftRows.size)
    leftRows.foreach { case (lid, lu, lts) =>
      val atOrBefore = rightRows.filter(c => c._2 == lu && c._3.getTime <= lts.getTime)
      val expected =
        if (atOrBefore.isEmpty) None
        else {
          val maxTs = atOrBefore.map(_._3.getTime).max
          Some(atOrBefore.filter(_._3.getTime == maxTs).map(_._1).max) // tie: largest id
        }
      assert(got(lid) == expected,
        s"left $lid ($lu @ ${lts.getTime}): got ${got(lid)}, expected $expected")
    }
  }

  test("intervalOverlapJoin == brute-force all-pairs on random intervals") {
    import graft.operators.Temporal
    def h(i: Long): Long = (i * 2654435761L) & 0x7fffffffL
    // random starts with lengths spanning 0..6 buckets (bucket=13s) so
    // pairs share anywhere from 1 to many cells — the claim-cell dedup
    // must still emit each overlapping pair exactly once
    val as = (0 until 150).map(i => (i.toLong, (h(i) % 300).toDouble,
      (h(i) % 300 + 1 + h(i + 3) % 80).toDouble))
    val bs = (0 until 150).map(i => (500L + i, (h(i + 11) % 300).toDouble,
      (h(i + 11) % 300 + 1 + h(i + 17) % 80).toDouble))
    val aDf = as.toDF("a_id", "a_start", "a_end")
    val bDf = bs.toDF("b_id", "b_start", "b_end")
    val got = Temporal.intervalOverlapJoin(
        aDf, "a_start", "a_end", bDf, "b_start", "b_end", bucketSeconds = 13L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = for {
      (ai, asrt, aend) <- as
      (bi, bsrt, bend) <- bs
      if asrt < bend && bsrt < aend
    } yield (ai, bi)
    assert(got.length == got.distinct.length,
      s"claim-cell dedup emitted duplicates: ${got.length} vs ${got.distinct.length}")
    assert(got.toSet == expected.toSet,
      s"missing=${(expected.toSet -- got.toSet).take(5)} extra=${(got.toSet -- expected.toSet).take(5)}")
  }

  test("sessionize: sessions partition events, boundaries respect the gap") {
    import graft.operators.Temporal
    val gapSec = 600L
    val gen = for {
      nUsers <- Gen.choose(1, 5)
      evs <- Gen.listOfN(60, for {
        u <- Gen.choose(1L, nUsers.toLong)
        t <- Gen.choose(0L, 200000L)   // seconds over ~2.3 days
      } yield (u, t))
    } yield evs.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
    samples(gen, 8).foreach { evs =>
      val df = evs.toDF("user_id", "t_s", "event_id")
        .withColumn("ts", timestamp_seconds(col("t_s"))).drop("t_s")
      val out = Temporal.sessionize(df, "user_id", "ts", gapSec, "event_id")
        .orderBy("user_id", "session_id").collect()
      // 1. counts partition the input
      assert(out.map(_.getAs[Long]("n_events")).sum == evs.length)
      // 2. duration == end - start, nonnegative
      out.foreach { r =>
        val s = r.getAs[java.sql.Timestamp]("session_start").getTime
        val e = r.getAs[java.sql.Timestamp]("session_end").getTime
        assert(r.getAs[Long]("duration_us") == (e - s) * 1000 &&
          e >= s)
      }
      // 3. inter-session gap per user strictly exceeds the threshold
      out.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
        rs.sortBy(_.getAs[Long]("session_id")).toSeq.sliding(2).foreach { w =>
          if (w.length == 2) {
            val gap = w(1).getAs[java.sql.Timestamp]("session_start").getTime -
              w(0).getAs[java.sql.Timestamp]("session_end").getTime
            assert(gap > gapSec * 1000, s"gap=$gap")
          }
        }
      }
    }
  }
}
