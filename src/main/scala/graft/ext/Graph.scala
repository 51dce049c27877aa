package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge DataFrames. Complements
  * [[Dedup.connectedComponents]] (min-label propagation) with rank-style
  * fixpoints.
  *
  * Scale design: one shuffle per iteration (the contribution aggregate on
  * dst) plus an equi-join of edges against the current ranks — the Pregel
  * cost shape; lineage is truncated per round with localCheckpoint (same
  * pattern as connectedComponents) so the plan does not grow with the
  * iteration count. Degrees are computed once and reused.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * Engine-portable determinism (the q99 oracle runs the identical
    * computation unrolled in DuckDB): each edge's contribution
    * rank/degree is routed through DECIMAL(28,12) so the in-neighbor sum
    * is order-independent, and the damping update
    * `(1-d)/N + d·sum` is a fixed sequence of correctly-rounded IEEE
    * double ops (both engines evaluate `1.0 - d` in doubles).
    *
    * Dangling nodes (no out-edges) are supported as rank SINKS — their
    * mass leaks, as in the uncorrected original formulation; the damping
    * term keeps ranks bounded. Nodes with no in-edges settle at the base
    * (1-d)/N.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85,
      assumeDistinct: Boolean = false,
      broadcastRanksBelow: Long = 4000000L
  ): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
    // pass assumeDistinct=true when the caller already deduplicated (e.g.
    // mirrored a distinct pair list) — skips a full-edge-list shuffle
    val e = if (assumeDistinct) e0 else e0.distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    // n collected ONCE (nodes is already materialized, so this is a
    // metadata-cheap job) — (1-d)/n and 1/n inline as literals with the
    // identical long->double division, and the node count doubles as the
    // broadcast gate below
    val n = nodes.count()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    // the only full-edge-list materialization: (src, dst, deg) reused by
    // every iteration's contribution join
    val eDeg = e.join(deg, "src").localCheckpoint(true)
    // r11: the per-iteration rank tables are |nodes|-sized — far below
    // broadcast range on any graph whose rank vector a driver MM could
    // hold anyway. Broadcasting them keeps the edge list UNSHUFFLED in
    // the contribution join (map-side BHJ + partial DECIMAL aggregation
    // over the checkpointed edge partitions); the pre-r11 SMJ shape
    // additionally AQE-coalesced its post-shuffle side to ONE task that
    // sort-merged 1.18M rows per iteration (measured 1.9 s/iter at
    // sf0.1). Above the gate (4M nodes ≈ 64 MB broadcast) the
    // shuffle-join form is the right plan and stays. Below ~4k nodes the
    // whole iteration is trivial either way and the per-iteration
    // broadcast-BUILD jobs are the larger cost (q261's domain graph
    // measured +0.5 s under always-broadcast) — tiny graphs keep the
    // plain join.
    val small = n >= 4096 && n <= broadcastRanksBelow
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df

    var ranks = nodes
      .select(col("node"), (lit(1.0) / lit(n)).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(maybeB(ranks.select(col("node").as("src"), col("r"))), "src")
        .select(col("dst"),
          (col("r") / col("deg")).cast(DecimalType(28, 12)).as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(maybeB(contribs), col("node") === col("dst"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / lit(n)
            + lit(damping) * coalesce(col("s").cast("double"), lit(0.0)))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Synchronous LABEL-PROPAGATION community detection over an undirected
    * edge list, fixed `rounds`: every node starts as its own label; each
    * round every node adopts the most frequent label among its neighbors,
    * ties broken to the LOWEST label (the deterministic variant of
    * Raghavan et al. 2007 — synchronous sweeps + total tie order make the
    * result engine-reproducible, unlike the randomized-order original).
    * Complements [[Dedup.connectedComponents]] (which merges everything
    * reachable): LPA splits dense regions joined by thin bridges.
    *
    * Returns (node, community) for every node; isolated endpoints cannot
    * occur (every node is on an edge by construction).
    *
    * Scale shape: per round, ONE equi-join of the directed edge list
    * against the current (node, label) table, one (node, label) count
    * aggregate, and a per-node struct-max argmax over the already-reduced
    * count table — every shuffle moves (long, long, count) rows only,
    * never adjacency lists. The struct max runs on the post-aggregation
    * table (≤ one row per distinct neighbor label per node), not the raw
    * pair stream, so the q141/x214 SortAggregate hazard does not bite.
    * Lineage truncates per round with localCheckpoint (the pageRank
    * pattern).
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int = 3
  ): DataFrame = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    val canon = edges
      .select(least(s, d).as("a"), greatest(s, d).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val adj = canon
      .select(col("a").as("node"), col("b").as("nbr"))
      .unionAll(canon.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint(true)
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("community"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nbr"),
          col("community").as("nl")), "nbr")
        .groupBy(col("node"), col("nl"))
        .agg(count(lit(1)).cast("long").as("c"))
        // argmax (count desc, label asc) via the primitive-buffer
        // aggregate — a codegen HashAggregate per round, never a
        // SortAggregate (counts < 2^53 are exact as doubles)
        .groupBy("node")
        .agg(graft.functions.GraftFunctions.argMaxTiedLow(
          col("c").cast("double"), col("nl")).as("_b"))
        .select(col("node"), col("_b.id").as("community"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Exact triangle census over an undirected edge list: node/edge counts,
    * wedge (open-path) count, triangle count, and the global clustering
    * coefficient 3·triangles / wedges.
    *
    * Algorithm: degree-ordered orientation (the standard exact method —
    * cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    * Last Reducer", WWW'11). Each undirected edge is directed from its
    * lower-(degree, id) endpoint to the higher; every triangle then has
    * exactly ONE node with two out-edges, so triangles = wedges formed by
    * out-edge pairs that close via the oriented edge between their
    * endpoints — counted once, no /3 correction, no duplicate explosion.
    *
    * Scale design: orientation bounds out-degrees by O(√m), so the wedge
    * fan-out is O(m^1.5) — the best known for exact counting — instead of
    * the Σdeg² a naive neighbor self-join pays (a single celebrity node
    * with 1M neighbors would otherwise emit 10^12 wedges from one key).
    * All joins are equi-joins (node keys / (v,w) pairs); the degree table
    * is one row per node and broadcasts when small. Edges are canonicalized
    * (a<b) + distinct'd once and reused via localCheckpoint.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    val e = edges
      .select(least(s, d).as("a"), greatest(s, d).as("b"))
      .filter(col("a") < col("b")) // drops self-loops and null endpoints
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint(true)
    // total-order rank (deg, node); orient each edge low-rank → high-rank
    val withRanks = e
      .join(deg.select(col("node").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("_db")), "b")
    val aFirst = struct(col("_da"), col("a")) < struct(col("_db"), col("b"))
    val oriented = withRanks
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, struct(col("_db").as("dg"), col("b").as("node")))
          .otherwise(struct(col("_da").as("dg"), col("a").as("node")))
          .as("rv"))
      .select(col("u"), col("rv"), col("rv").getField("node").as("v"))
      .localCheckpoint(true)
    // wedges: ordered out-edge pairs from one center; close on the (v,w) edge
    val o1 = oriented.select(col("u"), col("rv").as("r1"), col("v").as("w1"))
    val o2 = oriented.select(col("u"), col("rv").as("r2"), col("v").as("w2"))
    val wedges = o1.join(o2, Seq("u")).filter(col("r1") < col("r2"))
      .select(col("w1"), col("w2"))
    val triangles = wedges
      .join(oriented.select(col("u").as("w1"), col("v").as("w2")),
        Seq("w1", "w2"), "left_semi")
    val nTri = triangles.agg(count(lit(1)).cast("long").as("n_triangles"))
    val nE = e.agg(count(lit(1)).cast("long").as("n_edges"))
    val degAgg = deg.agg(
      count(lit(1)).cast("long").as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).cast("long").as("n_wedges"))
    degAgg.crossJoin(nE).crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3L).cast("double") * col("n_triangles") / col("n_wedges"), 6)
          .as("global_clustering"))
  }

  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over the (symmetrized) edge list — do high-degree nodes attach to
    * high-degree nodes? Computed from DECIMAL-exact sufficient statistics
    * (each undirected edge contributes both orientations, so Σx = Σy and
    * the closed form collapses to (N·Σxy − Σx²)/(N·Σx² − (Σx)² … with
    * x² meaning Σ of squares); the final expression is a fixed IEEE
    * sequence on exact sums — engine-portable like the q119 regression.
    *
    * Scale: canonical distinct + one degree aggregate + two equi-joins +
    * one global aggregate. Nothing is quadratic; the degree table
    * broadcasts when small.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    val e = edges
      .select(least(s, d).as("a"), greatest(s, d).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("deg"))
    val dec = (c: org.apache.spark.sql.Column) =>
      c.cast(DecimalType(12, 0))
    val sums = e
      .join(deg.select(col("node").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("_db")), "b")
      .agg(
        count(lit(1)).cast("long").as("m"),
        sum(dec(col("_da")) + dec(col("_db"))).as("sx"),
        sum(dec(col("_da")) * dec(col("_da"))
          + dec(col("_db")) * dec(col("_db"))).as("sxx"),
        sum(lit(2).cast(DecimalType(2, 0)) * dec(col("_da"))
          * dec(col("_db"))).as("sxy"))
    val nD = (col("m") * 2).cast("double")
    val sxD = col("sx").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * sxD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    sums.select(col("m").as("n_edges"),
      round(num / den, 8).as("assortativity"))
  }

  /** k-core decomposition (fixed k): iteratively peel nodes of degree < k
    * until the remaining subgraph is stable; returns (node, core_degree)
    * for the surviving core. The classic "dense cohesive subgraph"
    * extractor — and the peeling fixpoint is CONFLUENT (removal order
    * cannot change the result), which is what lets a DuckDB oracle
    * reproduce it by unrolling enough rounds (extra rounds are no-ops
    * after convergence).
    *
    * Scale design: each round is one degree aggregate + two key-only
    * semi joins (8 B/row — edge payloads never shuffle), with
    * localCheckpoint truncating lineage per round (house CC pattern).
    * Rounds are data-bounded, not size-bounded — peeling cascades are
    * short on real graphs — and `maxRounds` throws instead of silently
    * returning a non-fixpoint (the clusterIds lesson).
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 12
  ): DataFrame = {
    require(k >= 1, "k-core needs k >= 1")
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    var e = edges
      .select(least(s, d).as("a"), greatest(s, d).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true)
    var prev = -1L
    var rounds = 0
    while (true) {
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node")
        .agg(count(lit(1)).cast("long").as("core_degree"))
      val keep = deg.filter(col("core_degree") >= k).localCheckpoint(true)
      val n = keep.count()
      if (n == prev) return keep
      prev = n
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"kCore did not converge within $maxRounds rounds — raise maxRounds")
      val nodes = keep.select("node")
      e = e
        .join(nodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(nodes.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint(true)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Global triangle census + clustering coefficient of an undirected
    * graph: node/edge/wedge/triangle counts and the transitivity ratio
    * 3·T / W (rational — exact integer counts until one division).
    *
    * Scale design — degree orientation: every undirected edge is directed
    * from its (degree, id)-smaller endpoint to the larger, so each
    * triangle is enumerated exactly once (no /3 dedup pass) and the
    * wedge-join fan-out per node is bounded by its OUT-degree, which the
    * orientation caps at O(√m) on any graph — the standard defense
    * against hub nodes that makes the naive a<b ordering quadratic.
    * Wedges W = Σ C(deg,2) come from the degree table (no join); the
    * triangle probe is two equi-joins shuffling (long, long) pairs only.
    */
  def triangleCensus(
      edges: DataFrame,
      srcCol: String,
      dstCol: String
  ): DataFrame = {
    val s = col(srcCol).cast("long")
    val dd = col(dstCol).cast("long")
    val und = edges
      .select(least(s, dd).as("a"), greatest(s, dd).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint(true)
    // orient by (deg, node): u -> v iff (deg_u, u) < (deg_v, v)
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v")
      )
      .localCheckpoint(true)
    val e1 = oriented.select(col("u").as("x"), col("v").as("y"))
    val e2 = oriented.select(col("u").as("x"), col("v").as("z"))
    val wedges = e1.join(e2, "x").filter(col("y") < col("z"))
    val tri = wedges
      .join(
        oriented.select(
          least(col("u"), col("v")).as("y"),
          greatest(col("u"), col("v")).as("z")),
        Seq("y", "z"))
      .agg(count(lit(1)).cast("long").as("t"))
    val stats = deg
      .agg(
        count(lit(1)).cast("long").as("n_nodes"),
        sum(col("deg")).cast("long").as("degsum"),
        sum(col("deg") * (col("deg") - 1)).cast("long").as("wedges2")
      )
      // integer div keeps the counts exact (Spark's `/` on longs is double)
      .select(
        col("n_nodes"),
        expr("degsum div 2").as("n_edges"),
        expr("wedges2 div 2").as("n_wedges")
      )
    stats
      .crossJoin(broadcast(tri))
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("n_wedges"),
        col("t").as("n_triangles"),
        round(lit(3.0) * col("t").cast("double") /
          col("n_wedges").cast("double"), 6).as("transitivity")
      )
  }

  /** Common-neighbor link prediction: rank the NON-edges of an undirected
    * graph by how many neighbors the two endpoints share (plus the Jaccard
    * normalization cn / (deg_a + deg_b − cn)) and return the top-k — the
    * classic "which parts will co-sell next quarter" candidate generator.
    *
    * Input: canonical edges with src < dst; duplicates are removed unless
    * `assumeDistinct` (a repeated edge would double-count every wedge
    * through it — the q228 co-purchase builder emits one pair per shared
    * order).
    *
    * Scale shape: the wedge stream (pairs of neighbors around each center)
    * is Σ deg² rows, but it is CONSUMED map-side — groupBy(a,b) partial-
    * aggregates each center's pairs where they are generated (the q141
    * argmax pattern), so the exchange carries one row per CANDIDATE pair,
    * not per wedge. Existing edges leave via a long-pair anti-join; top-k
    * plans as TakeOrderedAndProject. No orientation trick applies to OPEN
    * wedges (the center is fixed), so a hub with degree d contributes d²
    * wedges — `maxDegree` is the production dial that drops super-hub
    * centers (cap 0 = exact, the oracle point).
    */
  def commonNeighborTopK(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      topK: Int,
      maxDegree: Long = 0L,
      assumeDistinct: Boolean = false
  ): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // a repeated (a,b) input edge would double-count every wedge through
    // it — dedup unless the caller already did (pageRank's flag pattern)
    val e = if (assumeDistinct) e0 else e0.distinct().localCheckpoint(true)
    val adj = e.select(col("a").as("ctr"), col("b").as("nbr"))
      .union(e.select(col("b").as("ctr"), col("a").as("nbr")))
    val deg = adj.groupBy("ctr").agg(count(lit(1)).cast("long").as("deg"))
    val adjD =
      if (maxDegree > 0)
        adj.join(deg.filter(col("deg") <= maxDegree), Seq("ctr"))
          .select("ctr", "nbr")
      else adj
    val x = adjD.select(col("ctr"), col("nbr").as("na"))
    val y = adjD.select(col("ctr"), col("nbr").as("nb"))
    val cn = x.join(y, Seq("ctr"))
      .filter(col("na") < col("nb"))
      .groupBy(col("na").as("a"), col("nb").as("b"))
      .agg(count(lit(1)).cast("long").as("cn"))
    // rank by cn BEFORE the degree lookups: the cut is a
    // TakeOrderedAndProject over the candidate stream, and the k surviving
    // rows broadcast into the degree joins (never the reverse)
    val top = cn.join(e, Seq("a", "b"), "left_anti")
      .orderBy(desc("cn"), asc("a"), asc("b"))
      .limit(topK)
    broadcast(top)
      .join(deg.select(col("ctr").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("ctr").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(col("a"), col("b"), col("cn"), col("deg_a"), col("deg_b"),
        (col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn")).cast("double"))
          .as("jaccard"))
      .orderBy(desc("cn"), asc("a"), asc("b"))
  }
}
