package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Vectors
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Vectors.bruteForceTopK(q, "qid", "qv", e, "vec_id", "embedding", k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val cents = Vectors.trainIvfCentroids(e, "embedding", nCentroids = 4)
    val ivf = Vectors.ivfTopK(e, "vec_id", "embedding", cents, nProbe = 2, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    println(s"ivf-exact recall=${(brute & ivf).size.toDouble / brute.size}")
    val cbs = Vectors.trainPqCodebooks(e, "embedding", dim = 64, m = 8, kSub = 16)
    for (rr <- Seq(0, 20, 50)) {
      val pq = Vectors.ivfPqTopK(e, "vec_id", "embedding", cents, cbs, nProbe = 2, k = 5, rerank = rr)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      println(s"m=8 kSub=16 rerank=$rr recall=${(brute & pq).size.toDouble / brute.size}")
    }
    spark.stop()
  }
}
