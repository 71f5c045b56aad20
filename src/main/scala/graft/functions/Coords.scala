package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZTF focal-plane coordinate transforms (srcdf.py:446-575).
  *
  * All integer/real arithmetic on the readout-channel id (RCID, 0..63)
  * and per-quadrant pixel coordinates — pure column expressions.
  * Constants follow the code, not the docstrings (SURVEY §2.12): a
  * readout quadrant is 3072 x 3080 pixels.
  */
object Coords {

  val XSizePix = 3072
  val YSizePix = 3080

  /** CCD number 1..16 from RCID (srcdf.py:482): ccd = rcid // 4 + 1 */
  def ccdFromRc(rcid: Column): Column = floor(rcid / 4) + 1

  /** Quadrant 1..4 within the CCD (srcdf.py:483): q = rcid % 4 + 1 */
  def quadFromRc(rcid: Column): Column = pmod(rcid, lit(4)) + 1

  /** Camera-wide coordinates (srcdf.py:446-506 compute_camera_coord,
    * fixing the reference's NameError at objtable.py:379 — SURVEY
    * §2.12). Maps per-quadrant (x, y) to a full focal-plane frame
    * given gap sizes between CCDs.
    */
  def cameraCoord(rcid: Column, x: Column, y: Column,
                  xgapPix: Int = 7, ygapPix: Int = 10,
                  rotate: Boolean = false): (Column, Column) = {
    val ccd = ccdFromRc(rcid)        // 1..16
    val q = quadFromRc(rcid)         // 1..4
    val ccdCol = pmod(ccd - 1, lit(4))      // 0..3 CCD grid column
    val ccdRow = floor((ccd - 1) / 4)       // 0..3 CCD grid row
    // quadrant position inside the CCD: q1 UR, q2 UL, q3 LL, q4 LR
    val qCol = when(q === 1 || q === 4, 1).otherwise(0)
    val qRow = when(q === 1 || q === 2, 1).otherwise(0)
    val xq = when(lit(rotate), lit(XSizePix) - x).otherwise(x)
    val yq = when(lit(rotate), lit(YSizePix) - y).otherwise(y)
    val xcam = (ccdCol * 2 + qCol) * XSizePix + ccdCol * xgapPix + xq
    val ycam = (ccdRow * 2 + qRow) * YSizePix + ccdRow * ygapPix + yq
    (xcam, ycam)
  }

  /** CCD-wide coordinates (srcdf.py:509-575 compute_ccd_coord, fixing
    * the `rcid_name` NameError — SURVEY §2.12): per-quadrant (x, y) to
    * a 2-quadrant-by-2-quadrant CCD frame, optional 180° rotation for
    * quadrants 1 and 2.
    */
  def ccdCoord(rcid: Column, x: Column, y: Column): (Column, Column) = {
    val q = quadFromRc(rcid)
    val qCol = when(q === 1 || q === 4, 1).otherwise(0)
    val qRow = when(q === 1 || q === 2, 1).otherwise(0)
    (qCol * XSizePix + x, qRow * YSizePix + y)
  }

  /** P8: edge trim (srcdf.py:578-613 trim_edges). Keeps sources at
    * least `trimX`/`trimY` pixels from the quadrant borders; returns
    * (kept, rejected) — the reference returns the rejected rows.
    */
  def trimEdges(df: DataFrame, xName: String, yName: String,
                trimX: Double, trimY: Double): (DataFrame, DataFrame) = {
    val cond = (col(xName) > trimX) && (col(xName) < (XSizePix - trimX)) &&
      (col(yName) > trimY) && (col(yName) < (YSizePix - trimY))
    (df.where(cond), df.where(!cond))
  }
}
