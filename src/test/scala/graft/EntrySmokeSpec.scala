package graft

/** t1-style smoke: every registered query runs at sf0.001; flagship
  * entry returns rows. */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys are consistent") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(Queries.all.map(_.name).distinct.size == Queries.all.size)
  }

  Queries.all.foreach { q =>
    test(s"smoke ${q.name}") {
      val n = q.fn(spark, sf001).count()
      assert(n >= 0)
    }
  }
}
