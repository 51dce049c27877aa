package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dim=1024 stress for the vector operators — the shape the typedLit-matrix
  * form of lshBucket exists for (a per-plane-literal plan at dim=1024/
  * nBits=16 would carry 16k Literal nodes through every Catalyst
  * transform). Vectors are deterministic (sin-derived), built scan-side.
  */
class WideVectorSpec extends SparkSpec {

  private val Dim = 1024

  /** 300 deterministic unit-ish vectors of dim 1024; row 1 is a planted
    * near-duplicate of row 0 (same generator, tiny phase shift).
    */
  private lazy val wide = {
    val base = spark.range(300).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(1, $Dim),
              |  j -> cast(sin(CASE WHEN id = 1 THEN 0 ELSE id END * $Dim + j
              |            + CASE WHEN id = 1 THEN 0.01 ELSE 0.0 END) AS float))"""
        .stripMargin).as("embedding"))
    base.cache()
  }

  test("lshBucket at dim=1024: sane buckets, bounded plan, fast analysis") {
    wide.count() // session startup + cache build OUT of the analysis timer
    val t0 = System.nanoTime()
    val withBucket = wide.withColumn("_b",
      Similarity.lshBucket(col("embedding"), Dim, nBits = 16))
    val analysisSec = (System.nanoTime() - t0) / 1e9
    assert(analysisSec < 5.0, f"analysis took $analysisSec%.1f s — plan bloat")

    val buckets = withBucket.select("_b").collect().map(_.getLong(0))
    assert(buckets.length == 300)
    assert(buckets.toSet.size > 16, "16-bit SRP should spread 300 vectors")
    // the planted near-dup must collide with its source far more often than
    // random vectors do: identical direction → identical signs on every plane
    val b = withBucket.filter(col("vec_id") <= 1).select("_b").collect()
    assert(b(0).getLong(0) == b(1).getLong(0),
      "near-identical vectors must share the 16-bit bucket")

    // plan-bloat guard: the native srp_bucket expression carries the 16×1024
    // plane matrix as a reference object and renders only its SHAPE in
    // plans — the payload must not appear at all, and the whole formatted
    // plan stays small. (The composable typedLit form rendered the ~320k-
    // char payload once; the per-plane-literal form would render it per
    // plane reference plus 16k Literal nodes.)
    val formatted = withBucket.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val sentinel = Similarity.hyperplanes(Dim, 16, 42L)(0)(1).toString
    assert(!formatted.contains(sentinel),
      "hyperplane payload leaked into the plan rendering")
    assert(formatted.contains("16x1024 planes"),
      s"expected the shape tag in the plan:\n$formatted")
    assert(formatted.length < 50 * 1024,
      s"formatted plan is ${formatted.length} chars")
  }

  test("cosine top-k at dim=1024 finds the planted near-duplicate") {
    val top = Similarity.bruteForceTopK(wide, "vec_id", "embedding", 0L, 5)
      .collect()
    assert(top.head.getLong(0) == 1L, s"expected planted dup first, got " +
      top.map(_.getLong(0)).mkString(","))
    assert(top.head.getDouble(1) > 0.99)
  }

  test("ivfAssignQuantized at dim=1024: every vector lands in a valid cell") {
    val centroids = wide.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("cq"))
      .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    assert(centroids.forall(_.length == Dim))
    val t0 = System.nanoTime()
    val cells = wide.withColumn("_cell",
        Similarity.ivfAssignQuantized(col("embedding"), centroids))
      .select("vec_id", "_cell").collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(cells.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    // each centroid's own vector must assign to itself (distance 0)
    cells.filter(_.getLong(0) < 8).foreach(r =>
      assert(r.getLong(1) == r.getLong(0), s"centroid self-assign: $r"))
    assert(sec < 30.0, f"300 rows × 8 cells × 1024 dims took $sec%.1f s")
  }

  test("lshTopK multi-probe works at dim=1024") {
    val top = Similarity.lshTopK(wide, "vec_id", "embedding", 0L, 5,
      dim = Dim, nBits = 16, probeHamming = 1).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 1L,
      "planted dup shares the bucket → must surface first")
  }
}
