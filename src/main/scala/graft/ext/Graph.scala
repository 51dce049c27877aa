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
      assumeDistinct: Boolean = false
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
    val nN = broadcast(nodes.agg(count(lit(1)).cast("long").as("n")))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    // the only full-edge-list materialization: (src, dst, deg) reused by
    // every iteration's contribution join
    val eDeg = e.join(deg, "src").localCheckpoint(true)

    var ranks = nodes.crossJoin(nN)
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"),
          (col("r") / col("deg")).cast(DecimalType(28, 12)).as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
      ranks = nodes.crossJoin(nN)
        .join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("n")
            + lit(damping) * coalesce(col("s").cast("double"), lit(0.0)))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks
  }
}
