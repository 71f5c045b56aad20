package graft

import graft.core.{Det, SqlMurmur}

/** End-to-end DuckDB oracle for the EP2 flagship pipeline.
  *
  * Mirrors Pipeline.stages stage by stage with the cross-engine-exact
  * recipes each stage's standalone oracle already proved out:
  *
  *  - synthetic sky positions: Spark's Murmur3 hash() emitted as SQL
  *    ([[graft.core.SqlMurmur]], cross-checked by
  *    tools/hash_oracle_check.py over the full key range);
  *  - per-star centroids: exact long sums over the integer
  *    milli-unit coordinates (same op order as Pipeline's inline A2
  *    aggregate — bit-identical doubles);
  *  - eps / rMatch: computed IN SQL from the same counts with the
  *    same IEEE expression order as Pipeline.stages, so the scalars
  *    are bit-identical;
  *  - DBSCAN minSamples=1: brute-force ε-pairs + recursive-CTE
  *    connected components, label = min member id (the m1_dbscan
  *    recipe; minSamples=1 makes every point core so the core/border
  *    split vanishes);
  *  - NN match: brute-force candidates within the radius, best by
  *    (dist2, s_suppkey) — the j3_nn_join recipe;
  *  - group selection (J8): NOT-EXISTS anti-join against the
  *    violating-cluster set, null-violates semantics spelled out;
  *  - M3 IQR rejection: the m3_iqr_outlier_clean recipe (long-sum
  *    means on the exact scale-8 grid, equal-width bins, round-6
  *    quantile_cont stats, /0→NULL matching try_divide);
  *  - tail: band-conditional reference (C3), second J8 cut, DISTINCT
  *    metadata join (J6).
  *
  * The oracle intentionally uses brute-force physical shapes (cross
  * joins + windows) — same answer as the cell-bucketed Spark plans,
  * checkable at sf0.01/sf0.1 where |stars| and |calibrators| are
  * small; the Spark side is the scale path.
  */
object PipelineOracle {

  val sql: String = {
    val starHashQ = {
      val hx = SqlMurmur.withPmodHash(
        "(SELECT DISTINCT l_partkey AS pk FROM sel)", "pk",
        Nil, 2000000L, "hx", Seq("pk"))
      SqlMurmur.withPmodHash(s"($hx)", "pk", Seq(7), 2000000L, "hy", Seq("pk", "hx"))
    }
    val suppHashQ = {
      val sx = SqlMurmur.withPmodHash(
        "(SELECT s_suppkey AS sk, s_acctbal FROM supplier)", "sk",
        Seq(3), 2000000L, "sxp", Seq("sk", "s_acctbal"))
      SqlMurmur.withPmodHash(s"($sx)", "sk", Seq(5), 2000000L, "syp",
        Seq("sk", "s_acctbal", "sxp"))
    }
    s"""WITH RECURSIVE
      -- EP1 + P1/P2: metadata join, dialect preselection
      sel AS (
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
               l.l_quantity, l.l_discount, l.l_extendedprice, o.o_orderstatus
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity > 2 AND l.l_returnflag IN ('A', 'N', 'R')),
      -- star sky positions: Murmur3 of the partkey (SqlMurmur)
      starh AS ($starHashQ),
      wc AS (
        SELECT s.*,
          sh.hx + (s.l_linenumber % 3) * 10 AS xi,
          sh.hy + (s.l_suppkey % 3) * 10 AS yi
        FROM sel s JOIN starh sh ON s.l_partkey = sh.pk),
      -- A2: per-star centroids — exact long sums over the integer
      -- milli-unit coordinates, then the same two IEEE divisions
      cent AS (
        SELECT l_partkey,
          (CAST(sum(xi) AS DOUBLE) / count(*)) / 1000.0 AS x_centroid,
          (CAST(sum(yi) AS DOUBLE) / count(*)) / 1000.0 AS y_centroid
        FROM wc GROUP BY l_partkey),
      -- adaptive eps from the star count (same IEEE op order as Pipeline)
      epsc AS (
        SELECT sqrt((0.2 * (2000.0 * 2000.0)) / (pi() * greatest(count(*), 1))) AS eps
        FROM cent),
      -- M1 (minSamples=1): ε-pairs + recursive-CTE CC, label = min id
      pairs AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM cent a, cent b, epsc
        WHERE a.l_partkey != b.l_partkey
          AND (a.x_centroid - b.x_centroid) * (a.x_centroid - b.x_centroid)
            + (a.y_centroid - b.y_centroid) * (a.y_centroid - b.y_centroid)
            <= eps * eps),
      r(id, label) AS (
        SELECT l_partkey, l_partkey FROM cent
        UNION
        SELECT e.b, r.label FROM r JOIN pairs e ON r.id = e.a),
      cc AS (SELECT id AS l_partkey, min(label) AS cluster FROM r GROUP BY id),
      -- calibrator catalog on the same synthetic plane
      suph AS ($suppHashQ),
      calib AS (
        SELECT sk AS s_suppkey, sxp / 1000.0 AS sx, syp / 1000.0 AS sy,
          s_acctbal / 1000 AS zp_ref
        FROM suph),
      rmc AS (
        SELECT sqrt((1.5 * (2000.0 * 2000.0)) / (pi() * greatest(count(*), 1))) AS rm
        FROM calib),
      -- J5/J3: match cluster centroids to calibrators within rMatch
      wcl AS (
        SELECT c.l_partkey, c.x_centroid, c.y_centroid, cc.cluster
        FROM cent c JOIN cc USING (l_partkey)),
      mcand AS (
        SELECT w.l_partkey, c.s_suppkey, c.zp_ref,
          (w.x_centroid - c.sx) * (w.x_centroid - c.sx)
            + (w.y_centroid - c.sy) * (w.y_centroid - c.sy) AS dist2
        FROM wcl w, calib c, rmc
        WHERE (w.x_centroid - c.sx) * (w.x_centroid - c.sx)
            + (w.y_centroid - c.sy) * (w.y_centroid - c.sy) <= rm * rm),
      mbest AS (
        SELECT * FROM (SELECT mcand.*, ROW_NUMBER() OVER
          (PARTITION BY l_partkey ORDER BY dist2, s_suppkey) AS rn FROM mcand)
        WHERE rn = 1),
      matched AS (
        SELECT w.l_partkey, w.cluster, b.s_suppkey, b.zp_ref, b.dist2 AS dist2cal
        FROM wcl w LEFT JOIN mbest b ON w.l_partkey = b.l_partkey),
      -- J2 merge-back onto every detection
      merged AS (
        SELECT wc.*, m.cluster, m.s_suppkey, m.zp_ref, m.dist2cal
        FROM wc LEFT JOIN matched m ON wc.l_partkey = m.l_partkey),
      -- J8 #1: keep only clusters whose every member matched in radius
      bad1 AS (
        SELECT DISTINCT cluster FROM merged, rmc
        WHERE NOT (dist2cal <= rm * rm) OR (dist2cal <= rm * rm) IS NULL),
      kept AS (
        SELECT merged.* FROM merged
        WHERE NOT EXISTS (SELECT 1 FROM bad1 WHERE bad1.cluster = merged.cluster)),
      -- C2: calibrated magnitude (every term terminates within 8
      -- decimals — see Pipeline's cal_mag note)
      calb AS (
        SELECT kept.*,
          (l_quantity + zp_ref)
            + l_discount * (l_extendedprice / 10000 - l_quantity / 8) AS cal_mag
        FROM kept),
      -- M3: per-cluster IQR outlier rejection (m3 oracle recipe, 8
      -- bins, cut 3; long-sum means — the scale-8 grid is exact)
      ca AS (
        SELECT cluster,
          ${Det.sqlDavgLong("cal_mag", 8)} AS av_mag,
          ${Det.sqlDavgLong("cal_mag", 8)} - ${Det.sqlDavgLong("l_quantity + zp_ref", 8)} AS mag_diff
        FROM calb GROUP BY cluster),
      mm AS (SELECT min(av_mag) AS lo, max(av_mag) AS hi FROM ca),
      bn AS (
        SELECT ca.*, CASE WHEN av_mag >= hi THEN 7
          ELSE CAST(floor((av_mag - lo) / ((hi - lo) / 8)) AS BIGINT) END AS bin
        FROM ca, mm),
      stt AS (
        SELECT bin, round(quantile_cont(mag_diff, 0.5), 6) AS med,
          round(quantile_cont(mag_diff, 0.75) - quantile_cont(mag_diff, 0.25), 6) AS iqr
        FROM bn GROUP BY bin),
      nrm AS (
        SELECT bn.cluster, abs(bn.mag_diff - stt.med) / stt.iqr AS norm_mag_dist
        FROM bn JOIN stt ON bn.bin = stt.bin),
      cln AS (
        SELECT calb.*, nrm.norm_mag_dist
        FROM calb LEFT JOIN nrm ON calb.cluster = nrm.cluster
        WHERE nrm.norm_mag_dist < 3.0),
      -- C3: band-wise reference magnitude (band = order status)
      br AS (
        SELECT cln.*, (l_quantity + zp_ref)
          + CASE WHEN o_orderstatus = 'O' THEN 0.0
                 WHEN o_orderstatus = 'F' THEN 0.1 ELSE 0.2 END AS ref_mag_band
        FROM cln),
      -- J8 #2: drop clusters with any member straying from its band ref
      bad2 AS (
        SELECT DISTINCT cluster FROM br
        WHERE NOT (abs(cal_mag - ref_mag_band) < 0.5)
           OR (abs(cal_mag - ref_mag_band) < 0.5) IS NULL),
      wel AS (
        SELECT br.* FROM br
        WHERE NOT EXISTS (SELECT 1 FROM bad2 WHERE bad2.cluster = br.cluster)),
      -- J6: dedup'd per-exposure metadata join
      irsa AS (
        SELECT DISTINCT o_orderkey AS obsid, o_custkey, o_orderpriority FROM orders)
      SELECT w.l_orderkey, w.l_linenumber, w.l_partkey, w.cluster, w.s_suppkey,
        w.cal_mag, w.ref_mag_band, w.norm_mag_dist, w.o_orderstatus,
        i.o_custkey, i.o_orderpriority
      FROM wel w JOIN irsa i ON w.l_orderkey = i.obsid
      ORDER BY w.l_orderkey, w.l_linenumber"""
  }
}
