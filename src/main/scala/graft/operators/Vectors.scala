package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search over `Array[Float]` columns.
  *
  * Baseline: brute-force cosine top-k (query set broadcast against
  * the candidate corpus — one scan, no shuffle of the big side).
  * Scale path: random-hyperplane LSH bucketing so only same-bucket
  * candidates are compared (bucket id is a high-cardinality shuffle
  * key). The hot cosine kernel is the compiled
  * [[graft.functions.Expressions.CosineSim]] expression; the
  * composable `zip_with`/`aggregate` forms below are kept as the
  * pure-built-ins reference implementation (identical results,
  * asserted in VectorsSpec). Floats widen to double before
  * multiplying.
  */
object Vectors {

  def toDoubles(v: Column): Column = transform(v, _.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row, the k nearest
    * candidates by (cosine rounded to 6, id) — rounding makes the
    * ranking deterministic across engines/summation orders. */
  def bruteForceTopK(queries: DataFrame, qId: String, qVec: String,
                     candidates: DataFrame, cId: String, cVec: String,
                     k: Int): DataFrame = {
    val cos = round(graft.functions.Expressions.cosineSim(col(qVec), col(cVec)), 6)
    // distribute the corpus before the O(|corpus|·|queries|·dim)
    // math — a single-split scan would score on one core
    val scored = candidates.repartition(col(cId))
      .join(broadcast(queries), col(qId) =!= col(cId))
      .select(col(qId), col(cId), cos.as("cosine"))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** All near-duplicate pairs (a < b) with cosine ≥ threshold within
    * a blocking key (e.g. a label / coarse cluster), avoiding the
    * unblocked n² comparison. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("_blk"), col(idCol).as("a"), col(vecCol).as("_va"))
    val b = df.select(col(blockCol).as("_blk"), col(idCol).as("b"), col(vecCol).as("_vb"))
    a.join(b, Seq("_blk")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(graft.functions.Expressions.cosineSim(col("_va"), col("_vb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Random-hyperplane LSH bucket id: `planes` sign bits, each the
    * sign of a pseudo-random ±1 projection. Weights are deterministic
    * data-independent constants, materialized driver-side so the
    * per-row work is one zip_with per plane (no per-element hashing). */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
      val weights = Array.tabulate(dim) { d =>
        if (scala.util.hashing.MurmurHash3.productHash((p, d)) % 2 == 0) 1.0 else -1.0
      }
      val proj = aggregate(
        zip_with(toDoubles(vec), typedlit(weights), (x, w) => x * w),
        lit(0.0), (a2, x) => a2 + x)
      acc.bitwiseOR(when(proj > 0, lit(1L << p)).otherwise(0L))
    }

  /** LSH-bucketed approximate top-k: compare only within buckets.
    * Same output shape as [[bruteForceTopK]]; recall measured in
    * VectorsSpec. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              dim: Int, planes: Int, k: Int): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol))
      .repartition(col(idCol))
      .select(col(idCol), col(vecCol),
        lshBucket(col(vecCol), dim, planes).as("_bucket"))
    val a = bucketed.select(col("_bucket"), col(idCol).as("qid"), col(vecCol).as("_qv"))
    val b = bucketed.select(col("_bucket"), col(idCol).as("cid"), col(vecCol).as("_cv"))
    val scored = a.join(b, Seq("_bucket")).where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(graft.functions.Expressions.cosineSim(col("_qv"), col("_cv")), 6).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }
}
