package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X-M17: trained gradient-boosted decision stumps (histogram
  * L2Boost — Friedman '01 least-squares boosting with depth-1 trees,
  * the LightGBM-style histogram variant) for the document-quality
  * label, completing the trained-model family next to the linear
  * ([[LogReg]]), probabilistic (tx_nb_langid), sequence
  * (ev_markov_eval) and tokenizer (tx_bpe_train) trainers with a
  * TREE model.
  *
  * Scale shape (the same histogram trick as [[LogReg]]): ONE corpus
  * scan aggregates the (u, v) → (n, k) train grid (map-side combine,
  * ≤ nBins² rows — BOUNDED); because every stump splits on a BINNED
  * feature, the boosted ensemble is constant per grid cell, so the
  * whole boosting loop runs driver-side on ≤ 256 cells — O(rounds ·
  * nBins · nBins²) arithmetic REGARDLESS of corpus size, no
  * per-round Spark job at all (cheaper than IRLS, which aggregates
  * once per iteration). The corpus is scanned twice total
  * (grid + holdout eval).
  *
  * Determinism / oracle: training is pure driver arithmetic on the
  * exact-integer grid — there is no cross-engine trajectory to
  * align. The fitted model (f0 + per-round (feat, thr, w_left,
  * w_right)) is inlined into the generated DuckDB twin as literals
  * (`Double.toString` shortest-round-trip — the m8_kmeans/m2_jenks
  * mechanism), and the ORACLE independently recomputes features,
  * labels, split membership and the fixed-order score chain; the
  * confusion-matrix hash gate then proves the whole apply path.
  * Split selection ties break deterministically (gain, then feature
  * index, then threshold).
  */
object Boost {

  final case class Stump(feat: Int, thr: Int, wl: Double, wr: Double)
  final case class Model(f0: Double, stumps: Seq[Stump])

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** L2Boost on the binned grid. `grid` rows: (u, v, n, k). */
  def fitStumps(grid: Seq[(Int, Int, Long, Long)], rounds: Int,
                nu: Double, nBins: Int): Model = {
    val nTot = grid.map(_._3).sum
    val kTot = grid.map(_._4).sum
    if (nTot == 0L) return Model(0.0, Nil)
    val f0 = q6(kTot.toDouble / nTot)
    val fit = scala.collection.mutable.Map[(Int, Int), Double]()
      .withDefaultValue(f0)
    val stumps = scala.collection.mutable.ArrayBuffer[Stump]()
    for (_ <- 1 to rounds) {
      // per-cell residual mass: Σ_i (y_i − F_cell) = k − n·F_cell
      val res = grid.map { case (u, v, n, k) =>
        (u, v, n, k - n * fit((u, v)))
      }
      var best: Option[(Double, Int, Int, Double, Double)] = None
      for (feat <- 0 to 1; thr <- 0 until nBins - 1) {
        var nL = 0L; var sL = 0.0; var nR = 0L; var sR = 0.0
        res.foreach { case (u, v, n, r) =>
          val x = if (feat == 0) u else v
          if (x <= thr) { nL += n; sL += r } else { nR += n; sR += r }
        }
        if (nL > 0 && nR > 0) {
          val gain = sL * sL / nL + sR * sR / nR
          val cand = (gain, feat, thr, q6(nu * sL / nL), q6(nu * sR / nR))
          // deterministic argmax: strictly-greater gain wins, ties
          // keep the earlier (feat, thr) in scan order
          if (best.forall(_._1 < gain)) best = Some(cand)
        }
      }
      best match {
        case Some((_, feat, thr, wl, wr)) =>
          stumps += Stump(feat, thr, wl, wr)
          grid.foreach { case (u, v, _, _) =>
            val x = if (feat == 0) u else v
            fit((u, v)) = fit((u, v)) + (if (x <= thr) wl else wr)
          }
        case None => // degenerate grid (all mass one side) — stop
          return Model(f0, stumps.toList)
      }
    }
    Model(f0, stumps.toList)
  }

  /** Train on the held-out split, score the holdout, dense 2×2
    * confusion matrix — the [[LogReg.lrQualityEval]] protocol with
    * the boosted ensemble in place of θ. */
  def boostQualityEval(docs: DataFrame, idCol: String, textCol: String,
                       zCut: Double = 0.0, nBins: Int = 16, rounds: Int = 6,
                       nu: Double = 0.5,
                       testBelowPerMille: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // narrow 4-column frame, referenced by the grid aggregate AND the
    // holdout eval — persist once (recomputable; the LogReg recipe)
    val feats = LogReg.featFrame(docs, idCol, textCol, nBins, zCut).persist(lvl)
    val model = trainOn(feats, nBins, rounds, nu, testBelowPerMille)
    val score = scoreCol(model)
    val pr = feats.where(col("_sb") < testBelowPerMille)
      .select(col("y").as("label"),
        when(score > 0.5, lit(1)).otherwise(lit(0)).as("label_pred"))
      .groupBy("label", "label_pred").agg(count(lit(1)).as("n"))
    val spine = spark.range(4).select(
      (col("id") / 2).cast("int").as("label"),
      (col("id") % 2).cast("int").as("label_pred"))
    spine.join(pr, Seq("label", "label_pred"), "left")
      .select(col("label"), col("label_pred"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Grid aggregate + driver fit (shared by the query fn and the
    * sqlGen literal emitter so both see the identical model). */
  def trainOn(feats: DataFrame, nBins: Int, rounds: Int, nu: Double,
              testBelowPerMille: Int): Model = {
    val grid = feats.where(col("_sb") >= testBelowPerMille)
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      // BOUNDED: ≤ nBins² rows by construction (binned feature grid)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)) // collect order is partition-dependent
    fitStumps(grid.toIndexedSeq, rounds, nu, nBins)
  }

  /** The ensemble score as a Spark column over (u, v) — one fixed
    * left-associated chain, shared with [[scoreSql]] so both engines
    * evaluate the identical IEEE expression. */
  def scoreCol(model: Model): org.apache.spark.sql.Column =
    model.stumps.foldLeft(lit(model.f0): org.apache.spark.sql.Column) {
      (acc, st) =>
        val x = if (st.feat == 0) col("u") else col("v")
        acc + when(x <= st.thr, lit(st.wl)).otherwise(lit(st.wr))
    }

  /** The ensemble score as a DuckDB expression over columns u, v —
    * the literal twin of [[scoreCol]]. */
  def scoreSql(model: Model): String =
    model.stumps.foldLeft(model.f0.toString) { (acc, st) =>
      val x = if (st.feat == 0) "u" else "v"
      s"($acc + CASE WHEN $x <= ${st.thr} THEN ${st.wl} ELSE ${st.wr} END)"
    }

  /** Featurize + train in one call — the sqlGen entry point (the
    * query fn and the oracle generator must see the identical
    * model, so both go through the same featFrame + trainOn pair). */
  def trainOnDocs(docs: DataFrame, idCol: String, textCol: String,
                  zCut: Double = 0.0, nBins: Int = 16, rounds: Int = 6,
                  nu: Double = 0.5, testBelowPerMille: Int = 200): Model =
    trainOn(LogReg.featFrame(docs, idCol, textCol, nBins, zCut),
      nBins, rounds, nu, testBelowPerMille)

  /** Generated DuckDB twin: feature/label CTEs (the lrQualitySql
    * fragments), the INLINED literal model, fixed-order score chain,
    * dense 2×2 confusion spine. */
  def boostQualitySql(srcCtes: String, zSql: String, model: Model,
                      nBins: Int = 16, testBelowPerMille: Int = 200,
                      zCut: Double = 0.0): String = {
    val nb = nBins
    val score = scoreSql(model)
    s"""WITH $srcCtes,
        feat AS (SELECT
          ${graft.operators.Text.sampleBucketSql("doc_id")} AS sb,
          CAST(least(${nb - 1}, floor((len(list_distinct(toks))/len(toks)) * $nb)) AS INT) AS u,
          CAST(least(${nb - 1}, floor(least(1.0, len(toks)/100.0) * $nb)) AS INT) AS v,
          CASE WHEN ($zSql) >= $zCut THEN 1 ELSE 0 END AS y
        FROM zsrc),
        pr AS (SELECT y AS label,
            CASE WHEN $score > 0.5 THEN 1 ELSE 0 END AS label_pred
          FROM feat WHERE sb < $testBelowPerMille),
        cm AS (SELECT label, label_pred, CAST(count(*) AS BIGINT) AS n
          FROM pr GROUP BY label, label_pred)
        SELECT sp.label, sp.label_pred, CAST(coalesce(cm.n, 0) AS BIGINT) AS n
        FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(label, label_pred)
        LEFT JOIN cm ON sp.label = cm.label AND sp.label_pred = cm.label_pred
        ORDER BY sp.label, sp.label_pred"""
  }
}
