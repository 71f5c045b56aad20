package graft

import graft.operators.Graph

/** k-core peeling vs an independent sequential reference. */
class KcoreSpec extends SparkSpec {
  import spark.implicits._

  private def refPeel(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, Long] = {
    var e = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter(p => p._1 != p._2).distinct
    for (_ <- 1 to rounds) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    Graph.kcorePeel(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("triangle survives 2-core peeling, pendant chain peels away") {
    // triangle 1-2-3 plus chain 3-4-5: 5 peels (deg 1), then 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = run(edges, k = 2, rounds = 3)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got.toString)
    assert(got == refPeel(edges, 2, 3))
  }

  test("matches the reference on a random graph, k=3") {
    val rng = new scala.util.Random(42)
    val edges = (1 to 300).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val got = run(edges, k = 3, rounds = 3)
    val want = refPeel(edges, 3, 3)
    assert(got == want, s"\ngot  ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
  }

  test("a long path fully peels under k=2 given enough rounds") {
    val edges = (1L to 6L).map(i => (i, i + 1))
    assert(run(edges, k = 2, rounds = 6).isEmpty)
    assert(refPeel(edges, 2, 6).isEmpty)
  }
}
