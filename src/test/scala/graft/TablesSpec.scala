package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** P4/P5/C9/C10/C11/J7 schema-utility coverage. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("requireCols error names the missing and available columns (P4)") {
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](Tables.requireCols(df, Seq("a", "nope")))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("a, b"))
  }

  test("wildcard matching is substring on star patterns, exact otherwise (C11)") {
    assert(Tables.matchesPattern("l_orderkey", "*orderkey"))
    assert(Tables.matchesPattern("l_orderkey", "l_order*"))
    assert(!Tables.matchesPattern("l_orderkey", "orderkey"))
    assert(Tables.patternsCovered(Seq("l_q*", "l_tax"), Seq("l_quantity", "l_tax")))
    assert(!Tables.patternsCovered(Seq("l_q*", "missing"), Seq("l_quantity", "l_tax")))
  }

  test("wildcardSelect keeps frame column order (P5)") {
    val df = Seq((1, 2, 3)).toDF("xa", "yb", "xc")
    assert(Tables.wildcardSelect(df, Seq("x*")).columns.toSeq == Seq("xa", "xc"))
  }

  test("downcast shrinks longs and doubles (C9)") {
    val df = Seq((1L, 2.0)).toDF("i", "f")
    val out = Tables.downcast(df)
    assert(out.schema("i").dataType == IntegerType)
    assert(out.schema("f").dataType == FloatType)
  }

  test("subtract keeps left duplicates not present in right (J7/U2)") {
    val a = Seq(1, 1, 2, 3).toDF("v")
    val b = Seq(2).toDF("v")
    assert(Tables.subtract(a, b).as[Int].collect().sorted.toSeq == Seq(1, 1, 3))
  }

  test("memUsageMb reports a positive estimate (C10)") {
    val df = Tables.load(spark, sf001, "nation")
    assert(Tables.memUsageMb(df) > 0)
  }
}
