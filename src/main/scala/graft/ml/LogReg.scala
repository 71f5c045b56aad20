package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Det
import graft.operators.Text

/** X-M14: trained logistic-regression document-quality classifier —
  * the fastText-style quality model production curation pipelines
  * run (cf. the reference's driver-side fits, srcdf.py:220-363; here
  * nothing detail-sized ever leaves the executors).
  *
  * Train/predict/eval in one operator with a held-out LCG split:
  * labels come from the fused quality signal's LINEAR score (pure
  * rational arithmetic — bit-exact across engines, no sigmoid in the
  * label path), features are two quantized per-doc signals
  * (type-token ratio, saturating length), and the trainer is
  * Newton/IRLS on a BINNED feature grid.
  *
  * Scale shape (the histogram/GBM trick): ONE corpus scan builds the
  * (u, v) → (n, k) bin grid (map-side combine, ≤ nBins² rows);
  * every Newton iteration is then an aggregate over the bounded grid
  * — a 9-double moment row (gradient + symmetric 3×3 Hessian) solved
  * in closed form (Cramer) on the driver, exactly the [[Ols]]
  * moment-aggregate shape. Iterations cost O(nBins²) regardless of
  * corpus size; the corpus is scanned twice total (grid + eval).
  *
  * Determinism: per-cell sigmoid is 1e-6 floor-quantized (exp()
  * differs across libms in the last ulp — the tx_quality_fused
  * recipe); moments are exact DECIMAL(30,8) sums (Det error model:
  * grid sums ≤ corpus rows, log10 + 8 ≤ 15 holds to ~1e7 rows —
  * past that raise the recipe's scale); θ is re-quantized to 1e-6
  * after every Newton step so both engines walk the identical
  * trajectory. The SQL twin [[lrQualitySql]] unrolls the iterations
  * as CTE rounds mirroring every operation in the same order.
  */
object LogReg {

  /** floor-to-1e-6 grid (the shared cross-engine rounding recipe). */
  private def q6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def q6c(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Trained thetas (intercept, ttr-bin weight, satlen-bin weight). */
  final case class Theta(t0: Double, t1: Double, t2: Double)

  private[ml] def featFrame(docs: DataFrame, idCol: String, textCol: String,
                        nBins: Int, zCut: Double): DataFrame = {
    val ttr = Text.typeTokenRatio(col(textCol))
    val satLen = least(lit(1.0), Text.tokenCount(col(textCol)) / 100.0)
    // spread BEFORE the feature projection: the corpus is byte-small
    // but the label/feature expressions are CPU-heavy, so a raw scan
    // plans one task and serializes the whole featurization (the
    // standing r01 minhash trap; measured 5 s single-task at sf0.1)
    graft.core.Tables.spread(docs.select(col(idCol), col(textCol)), col(idCol))
      .select(
      Text.sampleBucket(col(idCol)).as("_sb"),
      least(lit(nBins - 1), floor(ttr * nBins)).cast("int").as("u"),
      least(lit(nBins - 1), floor(satLen * nBins)).cast("int").as("v"),
      when(Text.fusedLinearScore(col(textCol)) >= zCut, lit(1)).otherwise(lit(0))
        .as("y"))
  }

  /** Newton/IRLS fit on the binned train grid. `grid` must carry
    * (n, k, ud, vd). One bounded aggregate + one closed-form 3×3
    * solve per iteration. */
  def irlsFit(grid: DataFrame, iters: Int): Theta = {
    var t0 = 0.0; var t1 = 0.0; var t2 = 0.0
    for (_ <- 1 to iters) {
      val tExpr = lit(t0) + lit(t1) * col("ud") + lit(t2) * col("vd")
      val p = q6c(lit(1.0) / (lit(1.0) + exp(-tExpr)))
      val w = col("n") * (p * (lit(1.0) - p))
      val r = col("k") - col("n") * p
      val row = grid.agg(
        Det.dsum(r, 8).as("g0"),
        Det.dsum(r * col("ud"), 8).as("g1"),
        Det.dsum(r * col("vd"), 8).as("g2"),
        Det.dsum(w, 8).as("h00"),
        Det.dsum(w * col("ud"), 8).as("h01"),
        Det.dsum(w * col("vd"), 8).as("h02"),
        Det.dsum(w * col("ud") * col("ud"), 8).as("h11"),
        Det.dsum(w * col("ud") * col("vd"), 8).as("h12"),
        // BOUNDED: single-row moment aggregate per Newton iteration
        Det.dsum(w * col("vd") * col("vd"), 8).as("h22")).collect()(0)
      // empty train grid: the decimal sums are NULL — no data, no
      // step; θ stays at zero (the prior) instead of crashing
      if (row.isNullAt(0)) return Theta(t0, t1, t2)
      val g0 = row.getDouble(0); val g1 = row.getDouble(1); val g2 = row.getDouble(2)
      val h00 = row.getDouble(3); val h01 = row.getDouble(4); val h02 = row.getDouble(5)
      val h11 = row.getDouble(6); val h12 = row.getDouble(7); val h22 = row.getDouble(8)
      // 3×3 Cramer, fixed association order — mirrored term-for-term
      // in lrQualitySql's s/d CTE layers
      val m11 = h11 * h22 - h12 * h12
      val m01 = h01 * h22 - h12 * h02
      val m02 = h01 * h12 - h11 * h02
      val n0a = g1 * h22 - h12 * g2
      val n0b = g1 * h12 - h11 * g2
      val n1c = h01 * g2 - g1 * h02
      val n2a = h11 * g2 - g1 * h12
      val det = h00 * m11 - h01 * m01 + h02 * m02
      if (det != 0.0) {
        val d0 = g0 * m11 - h01 * n0a + h02 * n0b
        val d1 = h00 * n0a - g0 * m01 + h02 * n1c
        val d2 = h00 * n2a - h01 * n1c + g0 * m02
        t0 = q6d(t0 + d0 / det)
        t1 = q6d(t1 + d1 / det)
        t2 = q6d(t2 + d2 / det)
      }
    }
    Theta(t0, t1, t2)
  }

  /** End-to-end: features → LCG split → grid → IRLS → holdout
    * confusion matrix (label, label_pred, n) on the dense 2×2 spine. */
  def lrQualityEval(docs: DataFrame, idCol: String, textCol: String,
                    zCut: Double = 0.0, nBins: Int = 16, iters: Int = 4,
                    testBelowPerMille: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // persist the featurized frame (4 small columns per doc, narrow,
    // recomputable): the label/feature expressions walk every token
    // 3× per doc (quality + TTR + dup-3-gram) — by far the operator's
    // dominant cost — and both the train grid and the holdout eval
    // consume it; unpersisted each pays its own corpus scan.
    val feat = featFrame(docs, idCol, textCol, nBins, zCut)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tr = feat.where(col("_sb") >= testBelowPerMille)
    val te = feat.where(col("_sb") < testBelowPerMille)
    val grid = tr.groupBy("u", "v")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("k"))
      .select(col("n"), col("k"),
        (col("u") / nBins.toDouble).as("ud"), (col("v") / nBins.toDouble).as("vd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val th = irlsFit(grid, iters)
    // holdout prediction on the bounded (u, v, y) cell table; the
    // trained model rides into the plan as three literals
    val cells = te.groupBy("u", "v", "y").agg(count(lit(1)).as("cnt"))
      .select(col("y"),
        (lit(th.t0) + lit(th.t1) * (col("u") / nBins.toDouble)
          + lit(th.t2) * (col("v") / nBins.toDouble)).as("s"), col("cnt"))
    val cm = cells
      .select(col("y").as("label"),
        when(col("s") > 0.0, lit(1)).otherwise(lit(0)).as("label_pred"), col("cnt"))
      .groupBy("label", "label_pred").agg(sum(col("cnt")).as("_n"))
    val spine = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("label", "label_pred")
    spine.join(cm, Seq("label", "label_pred"), "left")
      .select(col("label"), col("label_pred"),
        coalesce(col("_n"), lit(0L)).cast("long").as("n"))
  }

  /** Unrolled-iteration SQL twin of [[lrQualityEval]] over the
    * `documents` table (the labelPropagationSql discipline): grid
    * CTE, one (q, a, s, d, th) CTE round per Newton step, dense-spine
    * confusion tail. `zSql` must be the EXACT fused linear score
    * expression, `toksSql` the shared tokenizer; `zCut` mirrors
    * [[lrQualityEval]]'s label threshold (ADVICE r12: a hardcoded
    * 0.0 here silently mismatched non-default-zCut callers). */
  def lrQualitySql(srcCtes: String, zSql: String, iters: Int, nBins: Int = 16,
                   testBelowPerMille: Int = 200, zCut: Double = 0.0): String = {
    val nb = nBins
    def round(i: Int): String = {
      val prev = s"th${i - 1}"
      s"""q$i AS (SELECT g.n, g.k, g.ud, g.vd,
            floor(1.0/(1.0 + exp(-(t.t0 + t.t1*g.ud + t.t2*g.vd)))*1e6 + 0.5)/1e6 AS p
          FROM grid g CROSS JOIN $prev t),
          a$i AS (SELECT
            ${Det.sqlDsum("k - n*p", 8)} AS g0,
            ${Det.sqlDsum("(k - n*p)*ud", 8)} AS g1,
            ${Det.sqlDsum("(k - n*p)*vd", 8)} AS g2,
            ${Det.sqlDsum("n*(p*(1.0-p))", 8)} AS h00,
            ${Det.sqlDsum("n*(p*(1.0-p))*ud", 8)} AS h01,
            ${Det.sqlDsum("n*(p*(1.0-p))*vd", 8)} AS h02,
            ${Det.sqlDsum("n*(p*(1.0-p))*ud*ud", 8)} AS h11,
            ${Det.sqlDsum("n*(p*(1.0-p))*ud*vd", 8)} AS h12,
            ${Det.sqlDsum("n*(p*(1.0-p))*vd*vd", 8)} AS h22
          FROM q$i),
          s$i AS (SELECT *, h11*h22 - h12*h12 AS m11, h01*h22 - h12*h02 AS m01,
            h01*h12 - h11*h02 AS m02, g1*h22 - h12*g2 AS n0a, g1*h12 - h11*g2 AS n0b,
            h01*g2 - g1*h02 AS n1c, h11*g2 - g1*h12 AS n2a FROM a$i),
          d$i AS (SELECT *, h00*m11 - h01*m01 + h02*m02 AS det,
            g0*m11 - h01*n0a + h02*n0b AS d0,
            h00*n0a - g0*m01 + h02*n1c AS d1,
            h00*n2a - h01*n1c + g0*m02 AS d2 FROM s$i),
          th$i AS (SELECT
            CASE WHEN d.det = 0.0 THEN t.t0
                 ELSE floor((t.t0 + d.d0/d.det)*1e6 + 0.5)/1e6 END AS t0,
            CASE WHEN d.det = 0.0 THEN t.t1
                 ELSE floor((t.t1 + d.d1/d.det)*1e6 + 0.5)/1e6 END AS t1,
            CASE WHEN d.det = 0.0 THEN t.t2
                 ELSE floor((t.t2 + d.d2/d.det)*1e6 + 0.5)/1e6 END AS t2
          FROM d$i d CROSS JOIN $prev t)"""
    }
    s"""WITH $srcCtes,
        feat AS (SELECT
          ${Text.sampleBucketSql("doc_id")} AS sb,
          CAST(least(${nb - 1}, floor((len(list_distinct(toks))/len(toks)) * $nb)) AS INT) AS u,
          CAST(least(${nb - 1}, floor(least(1.0, len(toks)/100.0) * $nb)) AS INT) AS v,
          CASE WHEN ($zSql) >= $zCut THEN 1 ELSE 0 END AS y
        FROM zsrc),
        tr AS (SELECT * FROM feat WHERE sb >= $testBelowPerMille),
        te AS (SELECT * FROM feat WHERE sb < $testBelowPerMille),
        grid AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS k,
            u/$nb.0 AS ud, v/$nb.0 AS vd
          FROM tr GROUP BY u, v),
        th0 AS (SELECT 0.0 AS t0, 0.0 AS t1, 0.0 AS t2),
        ${(1 to iters).map(round).mkString(",\n        ")},
        tc AS (SELECT u/$nb.0 AS ud, v/$nb.0 AS vd, y, count(*) AS cnt
          FROM te GROUP BY u, v, y),
        pr AS (SELECT tc.y AS label,
            CASE WHEN (t.t0 + t.t1*tc.ud + t.t2*tc.vd) > 0.0 THEN 1 ELSE 0 END
              AS label_pred, tc.cnt
          FROM tc CROSS JOIN th$iters t),
        cm AS (SELECT label, label_pred, CAST(sum(cnt) AS BIGINT) AS n
          FROM pr GROUP BY label, label_pred)
        SELECT sp.label, sp.label_pred, CAST(coalesce(cm.n, 0) AS BIGINT) AS n
        FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(label, label_pred)
        LEFT JOIN cm ON sp.label = cm.label AND sp.label_pred = cm.label_pred
        ORDER BY sp.label, sp.label_pred"""
  }
}
