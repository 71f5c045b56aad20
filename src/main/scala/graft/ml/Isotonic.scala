package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X-M18: isotonic regression — PAVA (pool-adjacent-violators)
  * calibration of the trained boosted-stump scorer ([[Boost]]):
  * the standard post-training step (Zadrozny & Elkan '02) that turns
  * a model's raw score into a monotone empirical probability. Train
  * the scorer on the train split, bin its HELD-OUT scores, then fit
  * the least-squares-optimal monotone step function to the per-bin
  * label rate — the textbook calibrate-on-holdout protocol.
  *
  * Scale shape: ONE corpus scan builds features, one bounded
  * aggregate builds the (score-bin) → (n, k) grid (≤ nBins rows);
  * PAVA is driver arithmetic. Exactness: pooling keeps (Σk, Σn) as
  * LONG rationals and compares block rates by cross-multiplication
  * (k₁·n₂ vs k₂·n₁) — no floating point anywhere in the fit; the
  * only doubles are the ensemble score (a fixed dyadic literal
  * chain shared with the oracle via [[Boost.scoreSql]]) and the
  * final emitted rates. Fitted rates are literal-inlined into the
  * generated DuckDB twin (m8_kmeans mechanism); the oracle
  * independently recomputes features, scores, bins, the grid and
  * raw rates — so everything except the (spec-gated) PAVA loop is
  * hash-gated. IsotonicSpec proves PAVA against an independent
  * O(n²) reference and pins the monotone/pooling properties. */
object Isotonic {

  /** PAVA on (n, k) per ascending bin. Returns per-bin fitted
    * (kPool, nPool) rationals, monotone non-decreasing in k/n. */
  def pava(grid: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // blocks of (sumK, sumN, span); violation k1/n1 > k2/n2 tested
    // as k1*n2 > k2*n1 (longs; n ≤ corpus, k ≤ n — products < 2^63
    // for any per-bin mass this engine meets)
    val blocks = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    grid.foreach { case (n, k) =>
      blocks += ((k, n, 1))
      var merged = true
      while (merged && blocks.size >= 2) {
        val (k2, n2, s2) = blocks(blocks.size - 1)
        val (k1, n1, s1) = blocks(blocks.size - 2)
        if (k1 * n2 > k2 * n1) {
          blocks.remove(blocks.size - 1)
          blocks(blocks.size - 1) = (k1 + k2, n1 + n2, s1 + s2)
        } else merged = false
      }
    }
    blocks.toSeq.flatMap { case (k, n, span) => Seq.fill(span)((k, n)) }
  }

  private def binCol(score: org.apache.spark.sql.Column, nBins: Int) =
    least(lit(nBins - 1), greatest(lit(0),
      floor(score * nBins).cast("int")))

  /** Train the scorer, bin its holdout scores, PAVA the rate curve.
    * Returns (model, rows of (bin, n, k, fittedK, fittedN) asc). */
  def calibrationFit(docs: DataFrame, idCol: String, textCol: String,
                     nBins: Int = 16, zCut: Double = 0.0, rounds: Int = 6,
                     nu: Double = 0.5, testBelowPerMille: Int = 200)
      : (Boost.Model, Seq[(Int, Long, Long, Long, Long)]) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // referenced by the train-grid aggregate AND the holdout binning
    val feats = LogReg.featFrame(docs, idCol, textCol, nBins, zCut).persist(lvl)
    val model = Boost.trainOn(feats, nBins, rounds, nu, testBelowPerMille)
    val grid = feats.where(col("_sb") < testBelowPerMille)
      .select(binCol(Boost.scoreCol(model), nBins).as("bin"), col("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      // BOUNDED: ≤ nBins rows by construction
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val fit = pava(grid.map(t => (t._2, t._3)).toIndexedSeq)
    (model, grid.toIndexedSeq.zip(fit).map { case ((u, n, k), (fk, fn)) =>
      (u, n, k, fk, fn)
    })
  }

  /** Registry result: per occupied holdout score bin, raw and
    * isotonic (calibrated) label rates. */
  def calibrationEval(docs: DataFrame, idCol: String, textCol: String,
                      nBins: Int = 16, zCut: Double = 0.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    calibrationFit(docs, idCol, textCol, nBins, zCut)._2
      .map { case (u, n, k, fk, fn) =>
        (u.toLong, n, k, k.toDouble / n, fk.toDouble / fn)
      }
      .toDF("bin", "n", "k", "raw_rate", "iso_rate")
  }

  /** Generated DuckDB twin: features, ensemble score, bins, grid
    * and raw rates recomputed from data; model weights AND fitted
    * rates ride in as literals. */
  def calibrationSql(srcCtes: String, zSql: String, model: Boost.Model,
                     fit: Seq[(Int, Long, Long, Long, Long)],
                     nBins: Int = 16, zCut: Double = 0.0,
                     testBelowPerMille: Int = 200): String = {
    val nb = nBins
    // the pooled rate rides in as an exact INTEGER DIVISION, not a
    // printed double: DuckDB parses a many-digit numeric literal via
    // DECIMAL (even under CAST AS DOUBLE) and the decimal→double
    // conversion loses the last ulp (measured: 0.9754385964912281
    // parsed to …80); k/n with both sides exact longs is a correctly
    // rounded IEEE division in BOTH engines — bit-identical to the
    // Scala fk.toDouble / fn by construction
    val fitRows =
      if (fit.isEmpty) "(NULL, NULL)" // degenerate: empty holdout
      else fit.map { case (u, _, _, fk, fn) =>
        s"($u, CAST($fk AS DOUBLE) / $fn)"
      }.mkString(",\n              ")
    s"""WITH $srcCtes,
        feat AS (SELECT
          ${graft.operators.Text.sampleBucketSql("doc_id")} AS sb,
          CAST(least(${nb - 1}, floor((len(list_distinct(toks))/len(toks)) * $nb)) AS INT) AS u,
          CAST(least(${nb - 1}, floor(least(1.0, len(toks)/100.0) * $nb)) AS INT) AS v,
          CASE WHEN ($zSql) >= $zCut THEN 1 ELSE 0 END AS y
        FROM zsrc),
        sc AS (SELECT y,
            least(${nb - 1}, greatest(0,
              CAST(floor((${Boost.scoreSql(model)}) * $nb) AS INT))) AS bin
          FROM feat WHERE sb < $testBelowPerMille),
        grid AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(y) AS BIGINT) AS k
          FROM sc GROUP BY bin),
        iso AS (SELECT * FROM (VALUES
              $fitRows) AS t(bin, iso_rate))
        SELECT g.bin, g.n, g.k,
          CAST(g.k AS DOUBLE) / g.n AS raw_rate, iso.iso_rate
        FROM grid g JOIN iso ON iso.bin = g.bin
        ORDER BY g.bin"""
  }
}
