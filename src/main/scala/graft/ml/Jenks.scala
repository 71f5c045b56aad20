package graft.ml

/** M2: Jenks natural-breaks classification
  * (_objtable_methods.py:344-347 uses jenkspy.jenks_breaks).
  *
  * Exact Fisher-Jenks dynamic program, O(k·n²). Like the reference —
  * which calls jenkspy on the *per-cluster aggregate* (one value per
  * star, not per detection) — this runs driver-side on a collected
  * aggregate; the distributed part is producing that aggregate.
  * For inputs too big to collect, discretize first (quantile sketch)
  * — documented scale path, not needed for parity.
  *
  * Returns k+1 ascending break values: [min, b1, …, b(k-1), max],
  * matching jenkspy's convention.
  */
object Jenks {

  def breaks(valuesIn: Array[Double], k: Int): Array[Double] = {
    require(k >= 1, "need at least one class")
    val values = valuesIn.sorted
    val n = values.length
    require(n >= k, s"cannot split $n values into $k classes")

    // prefix sums for O(1) within-class variance
    val ps = new Array[Double](n + 1)
    val pss = new Array[Double](n + 1)
    var i = 0
    while (i < n) {
      ps(i + 1) = ps(i) + values(i)
      pss(i + 1) = pss(i) + values(i) * values(i)
      i += 1
    }
    @inline def ssd(lo: Int, hi: Int): Double = { // values[lo..hi-1]
      val cnt = hi - lo
      val s = ps(hi) - ps(lo)
      math.max(0.0, (pss(hi) - pss(lo)) - s * s / cnt)
    }

    // dp(c)(i): min total SSD splitting first i values into c classes
    val prev = new Array[Double](n + 1)
    val cur = new Array[Double](n + 1)
    val split = Array.ofDim[Int](k + 1, n + 1)
    var c1 = 0
    while (c1 <= n) { prev(c1) = ssd(0, c1); c1 += 1 }
    var c = 2
    while (c <= k) {
      var j = c
      while (j <= n) {
        var best = Double.MaxValue
        var bestSplit = c - 1
        var m = c - 1
        while (m < j) {
          val v = prev(m) + ssd(m, j)
          if (v < best) { best = v; bestSplit = m }
          m += 1
        }
        cur(j) = best
        split(c)(j) = bestSplit
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      c += 1
    }

    // backtrack break positions
    val out = new Array[Double](k + 1)
    out(k) = values(n - 1)
    out(0) = values(0)
    var pos = n
    var cc = k
    while (cc > 1) {
      pos = split(cc)(pos)
      out(cc - 1) = values(pos - 1)
      cc -= 1
    }
    out
  }

  /** Scale path (the r7 watch item): Jenks for inputs too large to
    * collect one value per cluster. Discretize to `maxPoints`
    * density-adaptive representatives via the mergeable quantile
    * sketch (equal-probability-mass points — heavy mass repeats a
    * value, which IS its weight), run the exact DP on those, and pin
    * the outer edges to the true min/max. One aggregate over the
    * frame, O(maxPoints) driver memory regardless of cardinality;
    * class assignment error is bounded by the sketch's rank error
    * (JenksSpec measures agreement vs the exact breaks). */
  def breaksApprox(df: org.apache.spark.sql.DataFrame, valueCol: String,
                   k: Int, maxPoints: Int = 1024): Array[Double] = {
    import org.apache.spark.sql.functions._
    val probs = Array.tabulate(maxPoints)(i => (i + 0.5) / maxPoints)
    // CAST to double: approx_percentile preserves the input type, and
    // getSeq[Double] on an int/long/float array would ClassCastException
    val row = df.agg(
      expr(s"approx_percentile(CAST($valueCol AS DOUBLE), array(${probs.mkString(",")}), 10000)")
        .as("_q"),
      min(col(valueCol)).cast("double").as("_lo"),
      // BOUNDED: single-row min/max aggregate
      max(col(valueCol)).cast("double").as("_hi")).collect()(0)
    // empty / all-NULL input: approx_percentile and min/max return
    // NULL — fail with a clear message instead of an NPE downstream
    require(!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2),
      s"breaksApprox: no non-null values in column '$valueCol'")
    val pts = row.getSeq[Double](0).toArray
    val edges = breaks(pts, k)
    edges(0) = row.getDouble(1)
    edges(k) = row.getDouble(2)
    edges
  }

  /** pd.cut(bins = breaks, include_lowest = True) bin index for a
    * value: 0-based class, the lowest edge inclusive. */
  def binOf(v: Double, edges: Array[Double]): Int = {
    var b = 0
    var i = 1
    while (i < edges.length - 1) {
      if (v > edges(i)) b = i
      i += 1
    }
    b
  }
}
