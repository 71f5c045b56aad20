package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the custom expressions through spark.sql. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate would return the shared suite session and skip the
  // extension injection — force a fresh session (context is reused),
  // then restore the shared one as default for later suites.
  lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  test("graft_cosine is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("graft_shingle_jaccard and graft_simhash from SQL") {
    val row = spark.sql(
      """SELECT graft_shingle_jaccard('hello world', 'hello world', 5) AS j,
         graft_simhash('hello world') AS s""").head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getLong(1) != 0L)
  }

  test("graft_minhash_bands returns band array") {
    val r = spark.sql("SELECT graft_minhash_bands('some text here', 5, 8, 4) AS b").head()
    assert(r.getSeq[String](0).length == 2)
  }

  test("graft_minhash_bands_poly, graft_healpix and graft_lsh_keys from SQL") {
    val row = spark.sql(
      """SELECT graft_minhash_bands_poly('some text here', 5, 8, 4) AS b,
         graft_healpix(0.0D, 90.0D, 64) AS pix,
         graft_lsh_keys(array(1.0D, -1.0D, 0.5D, 2.0D), 4, 6, 3) AS keys""").head()
    assert(row.getSeq[String](0).length == 2)
    assert(row.getLong(1) == graft.functions.Healpix.ang2pixNest(64, 0.0, 90.0))
    assert(row.getSeq[Long](2).length == 3)
  }

  test("graft_healpix_cover from SQL == the Scala disk cover") {
    val got = spark.sql(
      "SELECT graft_healpix_cover(10.0D, -45.0D, 64, 0.01D) AS cells")
      .head().getSeq[Long](0).toSet
    val expected = graft.functions.Healpix.coverDisk(64,
      graft.functions.Healpix.ang2pixNest(64, 10.0, -45.0), 0.01).toSet
    assert(got == expected && got.nonEmpty)
  }
}
