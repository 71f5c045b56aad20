package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is hot.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default here) splits oversized shuffle partitions at
  * runtime and is the first line of defense. This utility is the
  * explicit fallback for the cases AQE cannot rescue (e.g. one
  * literal key holding 30% of a 100 TB fact table): salt the skewed
  * (large) side into `factor` sub-keys and replicate the build side
  * once per salt, restoring a uniform shuffle.
  *
  * Semantics are identical to `left.join(right, keys, joinType)` for
  * inner/left joins on equi-keys; SkewSpec asserts equality.
  */
object Skew {

  /** Inner/left equi-join with a salted large side and a replicated
    * small side. `factor` ≈ number of sub-splits for the hottest key.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salting preserves semantics for inner/left equi-joins")
    val salted = large.withColumn("_salt",
      (rand(seed = 7) * factor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
