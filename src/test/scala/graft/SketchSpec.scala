package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch family (a15 approx aggregates, a21 HLL rollup, a22 CMS
  * heavy hitters): the sketch estimates are implementation-defined,
  * so the registry query hash-gates exact companions plus in-engine
  * bound booleans (oracle asserts them TRUE). This spec keeps the
  * TIGHT envelopes on the raw sketches — 3·rsd for HLL, and a
  * p±0.002 quantile band (2× the accuracy=1000 rank-error guarantee
  * of n/1000, the slack absorbing boundary rounding) — which the
  * query's 5·rsd / p±0.01 booleans deliberately relax. */
class SketchSpec extends SparkSpec {

  test("HLL distinct and quantile sketch within declared error bounds") {
    val li = Tables.load(spark, sf01, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("nd_approx"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("q"))
      .select(col("l_returnflag"), col("nd_approx"),
        col("q").getItem(0).as("p50_approx"), col("q").getItem(1).as("p95_approx"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.498)").as("p50lo"),
        expr("percentile(l_extendedprice, 0.502)").as("p50hi"),
        expr("percentile(l_extendedprice, 0.948)").as("p95lo"),
        expr("percentile(l_extendedprice, 0.952)").as("p95hi"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for (flag <- approx.keySet) {
      val g = approx(flag); val e = exact(flag)
      val nd = e.getAs[Long]("nd").toDouble
      // rsd = 0.02; allow 3 sigma
      assert(math.abs(g.getAs[Long]("nd_approx") - nd) / nd <= 0.06,
        s"$flag distinct: ${g.getAs[Long]("nd_approx")} vs $nd")
      // accuracy=1000 => rank error <= n/1000; the p±0.002 band is
      // 2x that guarantee
      assert(g.getAs[Double]("p50_approx") >= e.getAs[Double]("p50lo")
        && g.getAs[Double]("p50_approx") <= e.getAs[Double]("p50hi"), s"$flag p50")
      assert(g.getAs[Double]("p95_approx") >= e.getAs[Double]("p95lo")
        && g.getAs[Double]("p95_approx") <= e.getAs[Double]("p95hi"), s"$flag p95")
    }
  }

  test("registry query: every bound boolean true at sf0.1") {
    val rows = SparkEntry.queries("a15_approx_sketch")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("nd_approx_ok"), r.toString)
      assert(r.getAs[Boolean]("p50_approx_ok"), r.toString)
      assert(r.getAs[Boolean]("p95_approx_ok"), r.toString)
    }
  }

  test("a21: merged month sketches within 3·rsd of quarter-exact distinct") {
    // The registry boolean relaxes to 5·rsd; keep 3·rsd here.
    val o = Tables.load(spark, sf01, "orders").select(
      (year(col("o_orderdate")) * 10 + quarter(col("o_orderdate")))
        .cast("long").as("yq"),
      month(col("o_orderdate")).as("mon"), col("o_custkey"))
    val est = o.groupBy("yq", "mon")
      .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
      .groupBy("yq").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getAs[Long]("yq") -> r.getAs[Long]("est")).toMap
    val exact = o.groupBy("yq").agg(countDistinct(col("o_custkey")).as("nd"))
      .collect().map(r => r.getAs[Long]("yq") -> r.getAs[Long]("nd")).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    for ((yq, nd) <- exact)
      assert(math.abs(est(yq) - nd).toDouble / nd <= 3 * 1.04 / 64.0,
        s"yq=$yq est=${est(yq)} exact=$nd")
  }

  test("a22: CMS estimate bounds hold for EVERY key, not just the top-10") {
    val li = Tables.load(spark, sf01, "lineitem")
      .select(col("l_partkey").cast("long").as("k"))
    val eps = 1e-4
    val row = li.agg(
      count_min_sketch(col("k"), lit(eps), lit(0.999), lit(42)).as("cms"),
      count(lit(1)).as("n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val slack = (5 * eps * row.getLong(1)).toLong
    val est = graft.functions.Expressions.cmsEstimate(col("k"), cms)
    val bad = li.groupBy("k").agg(count(lit(1)).as("n_exact"))
      .where(est < col("n_exact") || est > col("n_exact") + lit(slack))
      .count()
    assert(bad == 0L)
  }

  test("a21/a22 registry booleans all true at sf0.1") {
    for ((q, bools) <- Seq(
        "a21_hll_rollup" -> Seq("merged_ok"),
        "a22_cms_heavy_hitters" -> Seq("cms_lower_ok", "cms_upper_ok"))) {
      val rows = SparkEntry.queries(q)(spark, sf01).collect()
      assert(rows.nonEmpty, q)
      rows.foreach(r => bools.foreach(b => assert(r.getAs[Boolean](b), s"$q $r")))
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
