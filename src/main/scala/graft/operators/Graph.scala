package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Det

/** Graph operators over edge frames.
  *
  * Scale design: everything is edge-frame relational algebra — an
  * iteration is one join (ranks onto edge sources) + one aggregate
  * (contributions by destination), both shuffling on node ids. No
  * adjacency lists are ever collected; nothing driver-side grows with
  * the graph.
  *
  * Determinism design (the 100 TB reproducibility problem): a float
  * PageRank differs run-to-run because the per-destination sum order
  * depends on partitioning. Here each contribution rank/outdeg is
  * floor-quantized on the 1e-12 grid (a double within 1 ulp of
  * k/1e12 is never near a half-quantum, so both engines' decimal
  * casts agree exactly), then summed as exact decimals — the result
  * is bit-identical at any parallelism, and the DuckDB oracle can
  * unroll the same iterations op-for-op.
  */
object Graph {

  /** PageRank with uniform init and damping, `iterations` synchronous
    * rounds. `edges` must carry `src`/`dst` long columns; dangling
    * nodes (no out-edges) keep only the teleport term — for symmetric
    * edge sets (co-occurrence graphs) none exist. Returns
    * (node, rank). */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85, scale: Int = 12): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return spark.emptyDataFrame
      .withColumn("node", lit(0L)).withColumn("rank", lit(0.0)).limit(0)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
    val ew = e.join(outdeg, "src").localCheckpoint()   // (src, dst, _deg)
    val teleport = (1.0 - damping) / n
    val f = math.pow(10, scale)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contribs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"),
          (floor(col("rank") / col("_deg").cast(DoubleType) * f + 0.5) / f)
            .as("_c"))
      val sums = contribs.groupBy(col("dst"))
        .agg(Det.dsum(col("_c"), scale).as("_s"))
      ranks = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("_s"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** The same computation as DuckDB SQL (iterations unrolled), for
    * the oracle: `edgesSql` must yield (src, dst). Every float op
    * mirrors [[pageRank]]: IEEE division, 1e-12 floor quantization,
    * exact decimal sums, teleport + damping in the same order. */
  def pageRankSql(edgesSql: String, iterations: Int,
                  damping: Double = 0.85, scale: Int = 12): String = {
    val f = s"1e$scale"
    def iter(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (SELECT e.dst,
            floor(r.rank / CAST(e.deg AS DOUBLE) * $f + 0.5) / $f AS c
          FROM ew e JOIN $prev r ON e.src = r.node),
          s$i AS (SELECT dst, CAST(sum(CAST(c AS DECIMAL(30,$scale))) AS DOUBLE) AS s
            FROM c$i GROUP BY dst),
          r$i AS (SELECT n.node,
            (CAST(1 AS DOUBLE) - $damping) / nn.n
              + $damping * coalesce(s.s, CAST(0 AS DOUBLE)) AS rank
          FROM nodes n CROSS JOIN ncount nn LEFT JOIN s$i s ON n.node = s.dst)"""
    }
    s"""WITH e AS ($edgesSql),
        nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
        ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        ew AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d ON e.src = d.src),
        r0 AS (SELECT n.node, CAST(1 AS DOUBLE) / nn.n AS rank
          FROM nodes n CROSS JOIN ncount nn),
        ${(1 to iterations).map(iter).mkString(",\n        ")}
        SELECT node, rank FROM r$iterations ORDER BY node"""
  }
}
