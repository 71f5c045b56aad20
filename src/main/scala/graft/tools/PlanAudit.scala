package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: walk every registered query's physical plan at a small
  * sf and report scale-hostile operators (CartesianProduct /
  * BroadcastNestedLoopJoin). Single-row broadcast crosses (scalar
  * aggregates riding into the plan) are reported so the spec
  * allowlist stays explicit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj)
          println(s"[audit] $name cartesian=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name BUILD-ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    println("[audit] done")
    spark.stop()
  }
}
