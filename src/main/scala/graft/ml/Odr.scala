package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Det

/** M4: errors-in-both-variables linear fit
  * (srcdf.py:220-363 photometric_solution, scipy.odr).
  *
  * The reference fits y = B0 + x0 + B1·x1 with errors on both axes by
  * orthogonal-distance regression on a driver-side sample (the
  * post-match calibrator set is small). The model is linear, so the
  * distributed form is: one aggregate pass for the second-order
  * moments (exact decimal sums — deterministic), then the closed-form
  * Deming-regression solution on the driver, broadcast back as
  * literal columns (the reference appends 4 constant columns,
  * srcdf.py:350-359).
  *
  * With z = y − x0 (the fixed-coefficient regressor folded into the
  * response) and δ = var(ε_z)/var(ε_u) the error-variance ratio:
  *
  *   b1 = (szz − δ·suu + sqrt((szz − δ·suu)² + 4δ·suz²)) / (2·suz)
  *   b0 = z̄ − b1·ū
  */
object Odr {

  /** Fit parameters AND their standard errors — the reference appends
    * both (srcdf.py:350-359 `output.beta`, `output.sd_beta`).
    * Closed-form from the same second-moment pass (no extra scan):
    *
    *   SE(b1)² = b1²/(n−2) · (suu·szz/suz² − 1)          (Linnet 1990,
    *     the asymptotic Deming slope variance; 0 for exact lines)
    *   SE(b0)² = s_rr/(n−2) + ū²·SE(b1)²                 with
    *     s_rr = szz − 2·b1·suz + b1²·suu (the 1/n residual moment) —
    *     the Var(z̄ − b1·ū) error-propagation term plus the slope term.
    *
    * Verified against empirical sampling spread in OdrSpec (no scipy
    * in this environment; the Monte-Carlo spread plays the fixture
    * role).
    */
  final case class Fit(b0: Double, b1: Double, sb0: Double, sb1: Double, n: Long)

  /** Deming fit of z on u. `delta` = ratio of z-error variance to
    * u-error variance (1.0 = orthogonal distances). */
  def demingFit(df: DataFrame, u: Column, z: Column, delta: Double = 1.0): Fit = {
    // spread the moment computation across cores even when the source
    // is a single parquet split; decimal sums are partition-order-
    // independent, so the round-robin repartition stays deterministic
    val shufflePartitions =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val uu = col("_u"); val zz = col("_z")
    val row = df.select(u.as("_u"), z.as("_z")).repartition(shufflePartitions)
      .agg(
      count(lit(1)).as("n"),
      Det.davg(uu, 6).as("ub"),
      Det.davg(zz, 6).as("zb"),
      Det.davg(uu * uu, 6).as("uub"),
      Det.davg(zz * zz, 6).as("zzb"),
      // BOUNDED: single-row moment aggregate
      Det.davg(uu * zz, 6).as("uzb")).collect()(0)
    val n = row.getAs[Long]("n")
    require(n >= 2, "need at least 2 points to fit")
    val ub = row.getAs[Double]("ub"); val zb = row.getAs[Double]("zb")
    val suu = row.getAs[Double]("uub") - ub * ub
    val szz = row.getAs[Double]("zzb") - zb * zb
    val suz = row.getAs[Double]("uzb") - ub * zb
    val b1 =
      if (suz == 0.0) 0.0
      else (szz - delta * suu + math.sqrt(
        (szz - delta * suu) * (szz - delta * suu) + 4 * delta * suz * suz)) / (2 * suz)
    val sb1 =
      if (suz == 0.0 || n <= 2) 0.0
      else math.sqrt(math.max(0.0,
        b1 * b1 / (n - 2) * (suu * szz / (suz * suz) - 1.0)))
    val srr = szz - 2 * b1 * suz + b1 * b1 * suu // 1/n residual moment
    val sb0 =
      if (n <= 2) 0.0
      else math.sqrt(math.max(0.0, srr / (n - 2) + ub * ub * sb1 * sb1))
    Fit(zb - b1 * ub, b1, sb0, sb1, n)
  }

  /** SQL twin of [[demingFit]] for the DuckDB oracle: single-row
    * SELECT with the same expression tree (bit-deterministic),
    * including the σ columns. */
  def demingSql(table: String, uExpr: String, zExpr: String, delta: Double = 1.0): String = {
    val d = delta.toString
    s"""WITH m AS (SELECT count(*) AS n,
         ${Det.sqlDavg(uExpr, 6)} AS ub, ${Det.sqlDavg(zExpr, 6)} AS zb,
         ${Det.sqlDavg(s"($uExpr)*($uExpr)", 6)} AS uub,
         ${Det.sqlDavg(s"($zExpr)*($zExpr)", 6)} AS zzb,
         ${Det.sqlDavg(s"($uExpr)*($zExpr)", 6)} AS uzb
       FROM $table),
       s AS (SELECT n, ub, zb, uub - ub*ub AS suu, zzb - zb*zb AS szz,
         uzb - ub*zb AS suz FROM m),
       f AS (SELECT n, ub, zb, suu, szz, suz,
         CASE WHEN suz = 0.0 THEN 0.0
              ELSE (szz - $d*suu + sqrt((szz - $d*suu)*(szz - $d*suu)
                + 4*$d*suz*suz)) / (2*suz) END AS b1
       FROM s),
       g AS (SELECT n, ub, zb, b1,
         CASE WHEN suz = 0.0 OR n <= 2 THEN 0.0
              ELSE sqrt(greatest(0.0,
                b1*b1/(n - 2) * (suu*szz/(suz*suz) - 1.0))) END AS sb1,
         szz - 2*b1*suz + b1*b1*suu AS srr
       FROM f)
       SELECT zb - b1*ub AS b0, b1,
         CASE WHEN n <= 2 THEN 0.0
              ELSE sqrt(greatest(0.0, srr/(n - 2) + ub*ub*sb1*sb1)) END AS sig_b0,
         sb1 AS sig_b1, n
       FROM g"""
  }
}
