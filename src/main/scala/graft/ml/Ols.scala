package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Det

/** X-M7: fully-distributed ordinary least squares for the two-
  * predictor linear model y = b0 + b1·x1 + b2·x2 — the 100 TB
  * complement to [[Odr]] (which the reference runs on a driver-side
  * post-match sample, srcdf.py:220-363). Here NOTHING detail-sized
  * leaves the executors: one aggregate pass collects the nine
  * first/second moments (exact decimal sums — partition-order-
  * independent, so the fit is bit-deterministic and the DuckDB
  * oracle can mirror it), and the 2×2 centered normal equations are
  * solved in closed form (Cramer) on the single moment row. The same
  * pass yields R² via the algebraic SSE identity — no second scan,
  * no residual materialization.
  *
  * Scale: the aggregate is one partial+final hash aggregate with a
  * 9-double state — the ideal map-side-combine shape; cost is one
  * scan of the fact table regardless of n.
  */
object Ols {

  /** Fit: intercept, two slopes, R², row count. */
  final case class Fit(b0: Double, b1: Double, b2: Double, r2: Double, n: Long)

  /** Moment scales: linear sums at 6 decimals, product sums at 4
    * (their magnitudes are ~squared, and the cross-engine conversion
    * bound needs log10|sum| + scale <= 15 — Det.scala's error model).
    * Keep |x|,|y| <= ~1e3 at 1e7 rows for bit parity. */
  def olsFit2(df: DataFrame, x1: Column, x2: Column, y: Column): Fit = {
    val shufflePartitions =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val u = col("_x1"); val v = col("_x2"); val w = col("_y")
    val row = df.select(x1.as("_x1"), x2.as("_x2"), y.as("_y"))
      .repartition(shufflePartitions)
      .agg(
        count(lit(1)).as("n"),
        Det.davg(u, 6).as("xb1"), Det.davg(v, 6).as("xb2"), Det.davg(w, 6).as("yb"),
        Det.davg(u * u, 4).as("x11"), Det.davg(v * v, 4).as("x22"),
        Det.davg(u * v, 4).as("x12"),
        Det.davg(u * w, 4).as("x1y"), Det.davg(v * w, 4).as("x2y"),
        // BOUNDED: single-row moment aggregate
        Det.davg(w * w, 4).as("yy")).collect()(0)
    val n = row.getAs[Long]("n")
    require(n >= 3, "need at least 3 points for a 2-predictor fit")
    val xb1 = row.getAs[Double]("xb1"); val xb2 = row.getAs[Double]("xb2")
    val yb = row.getAs[Double]("yb")
    // centered second moments (1/n normalization cancels in Cramer)
    val s11 = row.getAs[Double]("x11") - xb1 * xb1
    val s22 = row.getAs[Double]("x22") - xb2 * xb2
    val s12 = row.getAs[Double]("x12") - xb1 * xb2
    val s1y = row.getAs[Double]("x1y") - xb1 * yb
    val s2y = row.getAs[Double]("x2y") - xb2 * yb
    val syy = row.getAs[Double]("yy") - yb * yb
    val det = s11 * s22 - s12 * s12
    val b1 = if (det == 0.0) 0.0 else (s1y * s22 - s2y * s12) / det
    val b2 = if (det == 0.0) 0.0 else (s2y * s11 - s1y * s12) / det
    val b0 = yb - b1 * xb1 - b2 * xb2
    val sse = syy - 2.0 * (b1 * s1y + b2 * s2y) +
      b1 * b1 * s11 + 2.0 * (b1 * b2) * s12 + b2 * b2 * s22
    val r2 = if (syy == 0.0) 1.0 else 1.0 - sse / syy
    Fit(b0, b1, b2, r2, n)
  }

  /** X-M12: per-GROUP two-predictor OLS — one model per entity
    * (supplier, user, sensor…), the "fit a regression per key"
    * pattern a 100 TB feature pipeline runs where a driver-side
    * loop over groups cannot. Same nine-moment state as [[olsFit2]]
    * but held per group key, and the Cramer closed form + R²
    * evaluated as COLUMN expressions on the aggregate row — no
    * collect anywhere, output ∝ distinct keys. Expression layers
    * mirror [[olsSql]] term-for-term (same associativity), so the
    * grouped SQL twin is bit-identical. Groups with n < 3 are
    * dropped (under-determined).
    *
    * Det-recipe bound: per-GROUP row count now drives the decimal
    * conversion bound (log10(n·|y²|) + 4 ≤ 15) — keep |x|,|y| ≲ 1e2
    * if single keys can reach ~1e9 rows. */
  def olsFitPerGroup(df: DataFrame, keys: Seq[String],
                     x1: Column, x2: Column, y: Column): DataFrame = {
    val u = col("_x1"); val v = col("_x2"); val w = col("_y")
    val m = df.select(keys.map(col) ++ Seq(x1.as("_x1"), x2.as("_x2"), y.as("_y")): _*)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        Det.davg(u, 6).as("xb1"), Det.davg(v, 6).as("xb2"), Det.davg(w, 6).as("yb"),
        Det.davg(u * u, 4).as("x11"), Det.davg(v * v, 4).as("x22"),
        Det.davg(u * v, 4).as("x12"),
        Det.davg(u * w, 4).as("x1y"), Det.davg(v * w, 4).as("x2y"),
        Det.davg(w * w, 4).as("yy"))
      .where(col("n") >= 3)
    val s = m.select(col("*"),
      (col("x11") - col("xb1") * col("xb1")).as("s11"),
      (col("x22") - col("xb2") * col("xb2")).as("s22"),
      (col("x12") - col("xb1") * col("xb2")).as("s12"),
      (col("x1y") - col("xb1") * col("yb")).as("s1y"),
      (col("x2y") - col("xb2") * col("yb")).as("s2y"),
      (col("yy") - col("yb") * col("yb")).as("syy"))
    val d = s.select(col("*"),
      (col("s11") * col("s22") - col("s12") * col("s12")).as("det"))
    val b = d.select(col("*"),
      when(col("det") === 0.0, 0.0)
        .otherwise((col("s1y") * col("s22") - col("s2y") * col("s12")) / col("det"))
        .as("b1"),
      when(col("det") === 0.0, 0.0)
        .otherwise((col("s2y") * col("s11") - col("s1y") * col("s12")) / col("det"))
        .as("b2"))
    val f = b.select(col("*"),
      (col("yb") - col("b1") * col("xb1") - col("b2") * col("xb2")).as("b0"),
      ((col("syy") - lit(2.0) * (col("b1") * col("s1y") + col("b2") * col("s2y")))
        + col("b1") * col("b1") * col("s11")
        + (lit(2.0) * (col("b1") * col("b2"))) * col("s12")
        + col("b2") * col("b2") * col("s22")).as("sse"))
    f.select(keys.map(col) ++ Seq(
      col("b0"), col("b1"), col("b2"),
      when(col("syy") === 0.0, 1.0)
        .otherwise(lit(1.0) - col("sse") / col("syy")).as("r2"),
      col("n")): _*)
  }

  /** SQL twin of [[olsFitPerGroup]] — [[olsSql]]'s CTE chain with the
    * group keys carried through every layer. */
  def olsGroupSql(table: String, keys: Seq[String],
                  x1: String, x2: String, y: String): String = {
    val k = keys.mkString(", ")
    s"""WITH m AS (SELECT $k, count(*) AS n,
         ${Det.sqlDavg(x1, 6)} AS xb1, ${Det.sqlDavg(x2, 6)} AS xb2,
         ${Det.sqlDavg(y, 6)} AS yb,
         ${Det.sqlDavg(s"($x1)*($x1)", 4)} AS x11,
         ${Det.sqlDavg(s"($x2)*($x2)", 4)} AS x22,
         ${Det.sqlDavg(s"($x1)*($x2)", 4)} AS x12,
         ${Det.sqlDavg(s"($x1)*($y)", 4)} AS x1y,
         ${Det.sqlDavg(s"($x2)*($y)", 4)} AS x2y,
         ${Det.sqlDavg(s"($y)*($y)", 4)} AS yy
       FROM $table GROUP BY $k HAVING count(*) >= 3),
       s AS (SELECT $k, n, xb1, xb2, yb,
         x11 - xb1*xb1 AS s11, x22 - xb2*xb2 AS s22, x12 - xb1*xb2 AS s12,
         x1y - xb1*yb AS s1y, x2y - xb2*yb AS s2y, yy - yb*yb AS syy
       FROM m),
       d AS (SELECT *, s11*s22 - s12*s12 AS det FROM s),
       b AS (SELECT $k, n, xb1, xb2, yb, s11, s22, s12, s1y, s2y, syy,
         CASE WHEN det = 0.0 THEN 0.0 ELSE (s1y*s22 - s2y*s12) / det END AS b1,
         CASE WHEN det = 0.0 THEN 0.0 ELSE (s2y*s11 - s1y*s12) / det END AS b2
       FROM d),
       f AS (SELECT $k, n, b1, b2, yb - b1*xb1 - b2*xb2 AS b0,
         syy, (syy - 2.0*(b1*s1y + b2*s2y)) + b1*b1*s11
           + (2.0*(b1*b2))*s12 + b2*b2*s22 AS sse
       FROM b)
       SELECT $k, b0, b1, b2,
         CASE WHEN syy = 0.0 THEN 1.0 ELSE 1.0 - sse/syy END AS r2, n
       FROM f ORDER BY $k"""
  }

  /** SQL twin of [[olsFit2]]: the identical expression tree (same
    * moment scales, same op order) as nested CTE layers, so every
    * derived double is bit-identical to the Scala path. */
  def olsSql(table: String, x1: String, x2: String, y: String): String =
    s"""WITH m AS (SELECT count(*) AS n,
         ${Det.sqlDavg(x1, 6)} AS xb1, ${Det.sqlDavg(x2, 6)} AS xb2,
         ${Det.sqlDavg(y, 6)} AS yb,
         ${Det.sqlDavg(s"($x1)*($x1)", 4)} AS x11,
         ${Det.sqlDavg(s"($x2)*($x2)", 4)} AS x22,
         ${Det.sqlDavg(s"($x1)*($x2)", 4)} AS x12,
         ${Det.sqlDavg(s"($x1)*($y)", 4)} AS x1y,
         ${Det.sqlDavg(s"($x2)*($y)", 4)} AS x2y,
         ${Det.sqlDavg(s"($y)*($y)", 4)} AS yy
       FROM $table),
       s AS (SELECT n, xb1, xb2, yb,
         x11 - xb1*xb1 AS s11, x22 - xb2*xb2 AS s22, x12 - xb1*xb2 AS s12,
         x1y - xb1*yb AS s1y, x2y - xb2*yb AS s2y, yy - yb*yb AS syy
       FROM m),
       d AS (SELECT *, s11*s22 - s12*s12 AS det FROM s),
       b AS (SELECT n, xb1, xb2, yb, s11, s22, s12, s1y, s2y, syy,
         CASE WHEN det = 0.0 THEN 0.0 ELSE (s1y*s22 - s2y*s12) / det END AS b1,
         CASE WHEN det = 0.0 THEN 0.0 ELSE (s2y*s11 - s1y*s12) / det END AS b2
       FROM d),
       f AS (SELECT n, b1, b2, yb - b1*xb1 - b2*xb2 AS b0,
         syy, (syy - 2.0*(b1*s1y + b2*s2y)) + b1*b1*s11
           + (2.0*(b1*b2))*s12 + b2*b2*s22 AS sse
       FROM b)
       SELECT b0, b1, b2,
         CASE WHEN syy = 0.0 THEN 1.0 ELSE 1.0 - sse/syy END AS r2, n
       FROM f"""
}
