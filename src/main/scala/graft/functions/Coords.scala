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
    // Zero-indexed RC grid position (0..7 each axis), origin at the
    // bottom-left corner of the camera so RC 14 -> (0, 0) and
    // RC 48 -> (7, 7) (srcdf.py:488-490): the CCD grid column counts
    // DOWN with (ccd-1)%4 — CCD column 0 is rightmost on camera.
    val yrc = lit(2) * floor((ccd - 1) / 4) +
      when(q === 1 || q === 2, 1).otherwise(0)
    val xrc = lit(2) * (lit(4) - pmod(ccd - 1, lit(4))) - 1 -
      when(q === 2 || q === 3, 1).otherwise(0)
    // lower-left camera position of each RC incl. inter-CCD gaps
    // (srcdf.py:494-496), then the in-RC offset: rotate=180deg negates
    // the local coordinate (xll - x), not XSIZE - x (srcdf.py:499-504).
    val xll = floor(xrc / 2) * xgapPix + xrc * XSizePix
    val yll = floor(yrc / 2) * ygapPix + yrc * YSizePix
    if (rotate) (xll - x, yll - y) else (xll + x, yll + y)
  }

  /** CCD-wide coordinates (srcdf.py:509-575 compute_ccd_coord, fixing
    * the `rcid_name` NameError — SURVEY §2.12): per-quadrant (x, y) to
    * a 2-quadrant-by-2-quadrant CCD frame, optional 180° rotation for
    * quadrants 1 and 2.
    */
  def ccdCoord(rcid: Column, x: Column, y: Column,
               rotate: Boolean = true): (Column, Column) = {
    val q = quadFromRc(rcid)
    val qCol = when(q === 1 || q === 4, 1).otherwise(0)
    val qRow = when(q === 1 || q === 2, 1).otherwise(0)
    // rotate=true (the reference default, srcdf.py:560-563) negates the
    // local coordinates before adding the quadrant corner offset.
    val xr = if (rotate) -x else x
    val yr = if (rotate) -y else y
    (qCol * XSizePix + xr, qRow * YSizePix + yr)
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
