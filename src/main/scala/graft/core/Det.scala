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
  */
object Det {
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  /** Sample standard deviation from exact sums (ddof=1, matching
    * pandas `std` — SURVEY §2.4 A3). */
  def dstd(c: Column, scale: Int = 4): Column = {
    val n = count(lit(1)).cast(DoubleType)
    val s1 = dsum(c, scale)
    val s2 = dsum(c * c, scale)
    when(n > 1, sqrt(greatest(lit(0.0), (s2 - s1 * s1 / n) / (n - lit(1.0)))))
  }

  def sqlDsum(x: String, scale: Int = 4): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(30,$scale))) AS DOUBLE)"

  def sqlDavg(x: String, scale: Int = 4): String =
    s"${sqlDsum(x, scale)} / count(*)"

  def sqlDstd(x: String, scale: Int = 4): String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val s1 = sqlDsum(x, scale)
    val s2 = sqlDsum(s"($x)*($x)", scale)
    s"CASE WHEN count(*) > 1 THEN sqrt(greatest(0.0, ($s2 - $s1*$s1/$n) / ($n - 1.0))) END"
  }
}
