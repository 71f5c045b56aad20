package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic float aggregation helpers (oracle-parity mode).
  *
  * Summing doubles is order-dependent; Spark and the DuckDB oracle
  * will disagree in the last ulps. Routing sums through an exact
  * decimal accumulator and casting the *result* back to double makes
  * the aggregate bit-deterministic in both engines; derived scalar
  * double math (division, sqrt — IEEE-defined) stays deterministic.
  * The `sql*` twins emit the equivalent DuckDB SQL.
  *
  * Error model (two independent bounds; pick `scale` between them):
  *
  *  1. Quantization: each element is rounded to 1e-scale before the
  *     exact decimal sum, so the sum carries absolute error
  *     < n/2 * 1e-scale. Raise `scale` for small-magnitude data —
  *     at scale 4, squares below 5e-5 quantize to zero (ADVICE r01).
  *  2. Conversion: the final decimal->double cast is correctly
  *     rounded in the JVM (BigDecimal.doubleValue) but DuckDB
  *     converts unscaled-int128 -> double -> /10^scale, a double
  *     rounding. The two agree iff the unscaled result fits in a
  *     double's 53-bit mantissa: |sum| * 10^scale < 2^53 ~ 9e15.
  *     Keep log10|sum| + scale <= 15 or the last ulp can differ
  *     across engines (observed empirically on group sums ~1e17
  *     unscaled).
  *
  * Tie-points of k-decimal rounding are not binary-representable for
  * k >= 1, so the element-level double->decimal cast itself cannot
  * disagree across engines. Default scale 6 suits sums up to ~1e9;
  * pass a higher scale for small-magnitude data, lower for huge sums.
  * (Oracle-parity mode only — at production scale use plain `sum`.)
  */
object Det {
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(lit(1))

  /** Sample standard deviation from exact sums (ddof=1, matching
    * pandas `std` — SURVEY §2.4 A3). `scale2` controls the
    * squared-sum term separately (squares of small values need more
    * places; squares of large values hit conversion bound #2
    * sooner); < 0 means "same as scale". */
  def dstd(c: Column, scale: Int = 6, scale2: Int = -1): Column = {
    val n = count(lit(1)).cast(DoubleType)
    val s1 = dsum(c, scale)
    val s2 = dsum(c * c, if (scale2 < 0) scale else scale2)
    when(n > 1, sqrt(greatest(lit(0.0), (s2 - s1 * s1 / n) / (n - lit(1.0)))))
  }

  /** Fast deterministic mean for values whose decimal expansion
    * TERMINATES within `scale` digits (x·10^scale is integral): scale
    * to integers, sum as longs, divide back. Same quantization grid
    * as [[davg]] but the hot path is a codegen'd long sum instead of
    * BigDecimal churn (~50× cheaper per row — this is also the right
    * 100 TB shape). round() lands exactly on the integer because the
    * double is within ulps of it; both engines' double→int casts then
    * agree. Bounds: |sum(x·10^scale)| must stay < 2^53 so the final
    * long→double cast is exact. NOT for non-terminating values — use
    * [[davg]] (exact decimal) and pick the scale per its error model.
    */
  def davgLong(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    // Enforce the |sum| < 2^53 precondition (ADVICE r05): Spark's
    // non-ANSI sum(long) wraps silently on overflow, which would
    // corrupt means without error once groups grow past the safe
    // range (~1.5M rows of scale-8 values ~6e9). Guard with a cheap
    // per-group bound — max|xi|·n ≥ |sum(xi)| — and RAISE rather than
    // silently wrap when it's exceeded; the caller then switches to
    // the exact-decimal [[davg]] (an always-on decimal fallback
    // branch would compute the ~50× decimal sum for every group,
    // which is exactly what davgLong exists to avoid). raise_error is
    // evaluated lazily per output row, so in-bounds groups pay only
    // one extra long `max`.
    val xi = round(c * f)
    val longMean =
      (sum(xi.cast(LongType)).cast(DoubleType) / count(lit(1))) / f
    when(max(abs(xi)) * count(lit(1)) < lit(9.007199254740992e15), longMean)
      .otherwise(raise_error(lit(
        s"davgLong(scale=$scale): |sum| bound 2^53 exceeded — use davg")).cast(DoubleType))
  }

  def sqlDavgLong(x: String, scale: Int): String =
    s"(CAST(sum(CAST(round(($x) * 1e$scale) AS BIGINT)) AS DOUBLE) / count(*)) / 1e$scale"

  def sqlDsum(x: String, scale: Int = 6): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(30,$scale))) AS DOUBLE)"

  def sqlDavg(x: String, scale: Int = 6): String =
    s"${sqlDsum(x, scale)} / count(*)"

  def sqlDstd(x: String, scale: Int = 6, scale2: Int = -1): String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val s1 = sqlDsum(x, scale)
    val s2 = sqlDsum(s"($x)*($x)", if (scale2 < 0) scale else scale2)
    s"CASE WHEN count(*) > 1 THEN sqrt(greatest(0.0, ($s2 - $s1*$s1/$n) / ($n - 1.0))) END"
  }
}
