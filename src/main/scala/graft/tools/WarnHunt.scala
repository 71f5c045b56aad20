package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: construct (and analyze) every SparkEntry query plan with
  * a marker line around each, so construction-time WARNs (e.g. the
  * trivially-true equals predicate from a self-resolved join
  * condition, VERDICT r12 #4) can be attributed to a query by
  * grepping the interleaved log. No query is executed.
  */
object WarnHunt {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      // markers on stderr, same stream as log4j's console appender,
      // so interleaving is faithful
      System.err.println(s"### begin $name")
      System.err.flush()
      try fn(spark, dir).queryExecution.analyzed
      catch { case e: Throwable =>
        System.err.println(s"### error $name ${e.getClass.getSimpleName}")
      }
      System.err.println(s"### end $name")
      System.err.flush()
    }
    spark.stop()
  }
}
