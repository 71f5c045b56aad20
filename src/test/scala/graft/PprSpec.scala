package graft

import graft.operators.Graph

/** Personalized PageRank vs an independent dense reference that
  * mirrors the determinism recipe (1e-12 contribution quantization,
  * exact decimal sums), plus proximity/zero-rank properties. And the
  * exact latency-quantile interpolation vs a sorted-array reference. */
class PprSpec extends SparkSpec {
  import spark.implicits._

  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
                     iters: Int, damping: Double = 0.85): Map[Long, Double] = {
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val out = edges.groupBy(_._1)
    val deg = out.map { case (n, es) => n -> es.size }
    val ns = nodes.count(seeds)
    val teleport = (1.0 - damping) / ns
    var rank: Map[Long, Double] =
      nodes.map(n => n -> (if (seeds(n)) 1.0 / ns else 0.0)).toMap
    for (_ <- 1 to iters) {
      val contribs = scala.collection.mutable.Map[Long, BigDecimal]()
      out.foreach { case (src, es) =>
        val c = math.floor(rank(src) / deg(src) * 1e12 + 0.5) / 1e12
        es.foreach { case (_, dst) =>
          contribs(dst) = contribs.getOrElse(dst, BigDecimal(0)) +
            BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      rank = nodes.map { n =>
        val s = contribs.get(n).map(_.toDouble).getOrElse(0.0)
        n -> ((if (seeds(n)) teleport else 0.0) + damping * s)
      }.toMap
    }
    rank
  }

  test("matches the dense quantized reference bit-for-bit") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 2L),
      (4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L), (1L, 3L), (3L, 1L))
    val got = Graph.personalizedPageRank(
        edges.toDF("src", "dst"), Seq(1L, 2L).toDF("node"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    val want = refPpr(edges, Set(1L, 2L), 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (n, r) =>
      assert(r == want(n), s"node $n: $r vs ${want(n)}")
    }
    // proximity: nodes adjacent to the seeds outrank the far end
    assert(got(3L) > got(6L))
    // seeds hold teleport mass
    assert(got(1L) > 0.0 && got(2L) > got(6L))
  }

  test("nodes unreachable from the seeds converge to zero rank") {
    // two components; seeds only in the first
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val got = Graph.personalizedPageRank(
        edges.toDF("src", "dst"), Seq(1L).toDF("node"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(got(10L) == 0.0 && got(11L) == 0.0, got.toString)
    assert(got(1L) > 0.0 && got(2L) > 0.0)
  }

  test("exact quantiles match sorted-array linear interpolation") {
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0) // 1..9
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
    val row = df.groupBy("event_type").agg(
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.percentile(
          org.apache.spark.sql.functions.col("value"),
          org.apache.spark.sql.functions.lit(0.95)), 6).as("p95"))
      .collect()(0)
    // sorted 1..9, index 0.95*(9-1) = 7.6 -> 8 + 0.6*(9-8) = 8.6
    assert(row.getDouble(1) == 8.6, row.toString)
  }
}
