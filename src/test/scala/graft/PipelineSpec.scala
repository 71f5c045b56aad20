package graft

import org.apache.spark.sql.functions._

/** EP2 flagship pipeline invariants at sf0.001. */
class PipelineSpec extends SparkSpec {

  lazy val out = Pipeline.flagship(spark, sf001).cache()

  test("produces calibrated rows") {
    assert(out.count() > 0)
  }

  test("every surviving row is matched and within the match radius") {
    assert(out.where(col("s_suppkey").isNull).count() == 0)
  }

  test("norm_mag_dist respects the outlier cut") {
    assert(out.where(col("norm_mag_dist") >= 3.0).count() == 0)
  }

  test("cluster labels are min member part keys") {
    import spark.implicits._
    val bad = out.groupBy("cluster").agg(min("l_partkey").as("m"))
      .where(col("cluster") > col("m")).count()
    assert(bad == 0)
  }
}
