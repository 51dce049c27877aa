package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-based ANN: graph-build invariants, beam-search semantics, and
  * the recall/operating-curve behavior of the q258 family.
  */
class GraphAnnSpec extends SparkSpec {

  private lazy val e =
    spark.read.parquet(s"${sfDir()}/embeddings.parquet")

  test("exact graph: degree cap holds, no self-edges, deterministic") {
    val g = Similarity.knnGraphExact(e, "vec_id", "embedding", degree = 6)
      .cache()
    val deg = g.groupBy("s").agg(count(lit(1)).as("d"))
    assert(deg.filter(col("d") =!= 6).count() == 0) // every node capped
    assert(g.filter(col("s") === col("d")).count() == 0)
    // deterministic: second build is identical
    val g2 = Similarity.knnGraphExact(e, "vec_id", "embedding", degree = 6)
    assert(g.exceptAll(g2).count() == 0 && g2.exceptAll(g).count() == 0)
    g.unpersist()
  }

  test("beam search: widening the beam never shrinks the result set " +
    "quality on the fixture (recall curve is monotone here)") {
    val graph = Similarity.knnGraphExact(e, "vec_id", "embedding", 6)
      .localCheckpoint()
    val curve = Similarity.beamRecallCurve(e, "vec_id", "embedding",
        graph, col("vec_id") < 20, k = 10, efs = Seq(2, 4, 8), hops = 4,
        entryId = 0L)
      .orderBy("beam_width").collect()
    val rec = curve.map(_.getAs[Double]("recall_at_k"))
    assert(rec(0) <= rec(1) && rec(1) <= rec(2),
      s"curve not monotone on fixture: ${rec.mkString(",")}")
    assert(rec(2) > 0.3, s"ef=8 recall implausibly low: ${rec(2)}")
    // recall is a proper fraction of n_queries * k
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("beam results: k per query max, query never its own neighbor, " +
    "results are graph-reachable within hops of the entry") {
    val graph = Similarity.knnGraphExact(e, "vec_id", "embedding", 6)
      .localCheckpoint()
    val res = Similarity.beamSearchTopK(e, "vec_id", "embedding", graph,
      col("vec_id") < 10, k = 10, ef = 8, hops = 4, entryId = 0L).cache()
    assert(res.filter(col("q") === col("v")).count() == 0)
    val perQ = res.groupBy("q").agg(count(lit(1)).as("n"))
    assert(perQ.filter(col("n") > 10).count() == 0)
    // reachability: BFS from the entry within `hops` covers every result
    val edges = graph.collect().map(r => r.getLong(0) -> r.getLong(1))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var frontier = Set(0L)
    var seen = Set(0L)
    for (_ <- 1 to 4) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
        .diff(seen)
      seen = seen ++ frontier
    }
    val resultIds = res.select("v").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(resultIds.subsetOf(seen),
      s"unreachable ids in results: ${resultIds.diff(seen).take(5)}")
    res.unpersist()
  }

  test("bucketed production graph is degree-capped and self-free") {
    val g = Similarity.knnGraphBucketed(e, "vec_id", "embedding",
      degree = 6, dim = 64, nBits = 8, probeHamming = 1, portable = true)
      .cache()
    assert(g.filter(col("s") === col("d")).count() == 0)
    val deg = g.groupBy("s").agg(count(lit(1)).as("d"))
    assert(deg.filter(col("d") > 6).count() == 0)
    // bucketed build finds most nodes some neighbors on this corpus
    assert(g.select("s").distinct().count() >
      e.count() / 2, "bucketed graph lost most nodes")
    g.unpersist()
  }
}
