package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Text}

/** Dev profiler for the minhash pipeline stages. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    time("band keys (compiled expr)") {
      Tables.spread(docs, col("doc_id"))
        .select(graft.functions.Expressions.minHashBands(col("text"), 5, 8, 4).as("b"))
        .select(sum(size(col("b")))).collect()
    }
    val cands = time("candidates") {
      val c = Dedup.minhashCandidatePairs(docs, "doc_id", "text", 5, 8, 4)
      println("cand pairs: " + c.count()); c
    }
    time("verified") {
      println("verified: " + Dedup.minhashVerifiedPairs(docs, "doc_id", "text", 0.25, 5, 8, 4).count())
    }
    spark.stop()
  }
}
