package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** a15_approx_sketch: the sketch estimates have no SQL oracle (they
  * are implementation-defined); this bounds their error against the
  * exact aggregates instead. */
class SketchSpec extends SparkSpec {

  test("HLL distinct and quantile sketch within declared error bounds") {
    val got = SparkEntry.queries("a15_approx_sketch")(spark, sf01)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.load(spark, sf01, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    for (flag <- got.keySet) {
      val g = got(flag); val e = exact(flag)
      val nd = e.getAs[Long]("nd").toDouble
      // rsd = 0.02; allow 3 sigma
      assert(math.abs(g.getAs[Long]("nd_partkey_approx") - nd) / nd <= 0.06,
        s"$flag distinct: ${g.getAs[Long]("nd_partkey_approx")} vs $nd")
      // accuracy=1000 => rank error <= n/1000; prices are dense, so
      // the value error stays within a small relative band
      assert(math.abs(g.getAs[Double]("p50_approx") - e.getAs[Double]("p50"))
        / e.getAs[Double]("p50") <= 0.02, s"$flag p50")
      assert(math.abs(g.getAs[Double]("p95_approx") - e.getAs[Double]("p95"))
        / e.getAs[Double]("p95") <= 0.02, s"$flag p95")
    }
  }

  test("sketch aggregation is map-side partial (no raw-row shuffle)") {
    val plan = SparkEntry.queries("a15_approx_sketch")(spark, sf01)
      .queryExecution.executedPlan.toString
    // partial_approx_count_distinct before the exchange = the sketch
    // merges, not the rows, cross the wire
    assert(plan.contains("partial_approx_count_distinct")
      || plan.contains("partial approx_count_distinct")
      || plan.toLowerCase.contains("objhashaggregate"), plan)
  }
}
