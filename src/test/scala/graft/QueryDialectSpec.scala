package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.QueryDialect

class QueryDialectSpec extends AnyFunSuite {
  private def tr(e: String, p: Map[String, Any] = Map.empty) =
    QueryDialect.translate(e, p)

  test("reference notebook expression translates") {
    assert(tr("flags == 0 and snr>2") == "( flags = 0) AND ( snr > 2)"
      .replaceAll("\\s+", " ") || tr("flags == 0 and snr>2").replaceAll("\\s+", " ")
      == "(flags = 0) AND (snr > 2)")
  }

  test("chained comparison expands to conjunction") {
    val out = tr("17.5 < cal_mag < 18.5").replaceAll("\\s+", " ")
    assert(out.contains("17.5 < cal_mag") && out.contains("cal_mag < 18.5") &&
      out.contains("AND"))
  }

  test("host params inline as literals") {
    val out = tr("clusterID not in @bad_ids", Map("bad_ids" -> Seq(1, 2, 3)))
    assert(out.replaceAll("\\s+", " ").contains("NOT IN (1, 2, 3)"))
  }

  test("string params are quoted and escaped") {
    val out = tr("name == @n", Map("n" -> "o'brien"))
    assert(out.contains("'o''brien'"))
  }

  test("not keeps python semantics via NOT(...)") {
    val out = tr("not (norm_mag_dist < 2.5)").replaceAll("\\s+", " ")
    assert(out.startsWith("NOT (") && out.contains("norm_mag_dist < 2.5"))
  }

  test("& | ~ forms work") {
    val out = tr("(a > 1) & ~(b < 2) | (c == 3)")
    assert(out.contains("OR") && out.contains("AND") && out.contains("NOT"))
  }

  test("python list literal becomes IN (...)") {
    val out = tr("x in [1, 2, 3]").replaceAll("\\s+", " ")
    assert(out.contains("IN ( 1 , 2 , 3 )") || out.contains("IN (1 , 2 , 3)")
      || out.contains("IN (1, 2, 3)") || out.contains("IN ( 1 , 2 , 3)"))
  }

  test("missing param raises") {
    assertThrows[IllegalArgumentException](tr("x == @nope"))
  }

  test("filters real data equivalently to hand-written SQL") {
    val spark = SparkSpec.spark
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val a = QueryDialect.query(li,
      "10 < l_quantity <= 20 and l_returnflag in @f and not (l_linenumber < 2)",
      Map("f" -> Seq("A", "R"))).count()
    val b = li.where("10 < l_quantity AND l_quantity <= 20 AND " +
      "l_returnflag IN ('A','R') AND NOT (l_linenumber < 2)").count()
    assert(a == b && a > 0)
  }
}
