package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Skew
import graft.sources.Bucketed

class SkewSpec extends SparkSpec {

  test("salted join == plain join under heavy key skew") {
    import spark.implicits._
    // 90% of the fact rows share one key
    val fact = (1L to 20000L).map(i => (if (i % 10 == 0) i % 50 else 1L, i))
      .toDF("k", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).agg(
      count(lit(1)), sum("payload")).collect()(0)
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), factor = 8).agg(
      count(lit(1)), sum("payload")).collect()(0)
    assert(plain == salted)
  }

  test("left join keeps unmatched rows under salting") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = Skew.saltedJoin(fact, dim, Seq("k"), factor = 4, joinType = "left")
    assert(out.count() == 3)
    assert(out.where(col("k") === 99 && col("w").isNull).count() == 1)
  }
}

class BucketedSpec extends SparkSpec {

  test("bucketed join and aggregation run without a shuffle exchange") {
    val li = Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketed.write(li, "li_bucketed", "l_orderkey", 8)
    Bucketed.write(o, "o_bucketed", "l_orderkey", 8)

    val joined = Bucketed.read(spark, "li_bucketed")
      .join(Bucketed.read(spark, "o_bucketed"), Seq("l_orderkey"))
    assert(Bucketed.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)

    // result parity with the plain-layout join
    val expected = li.join(o, Seq("l_orderkey")).count()
    assert(joined.count() == expected)
  }
}
