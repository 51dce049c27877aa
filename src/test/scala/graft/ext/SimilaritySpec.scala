package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    // 0 and 10 nearly identical; 1 orthogonal-ish; rest random-ish (seeded)
    val rng = new scala.util.Random(7)
    val base = Array.fill(8)(rng.nextGaussian().toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val rows = Seq(0L -> base, 10L -> near, 1L -> Array.fill(8)(0f).updated(1, 1f)) ++
      (2L to 9L).map(i => i -> Array.fill(8)(rng.nextGaussian().toFloat))
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: hand-checked values") {
    import spark.implicits._
    val d = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(1f, 1f), Seq(1f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(d(0)) < 1e-12)
    assert(math.abs(d(1) - 1.0) < 1e-12)
    assert(math.abs(d(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK: planted near-duplicate ranks first") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .collect()
    assert(top.head.getLong(0) == 10L)
    assert(top.head.getAs[Double]("cos_sim") > 0.999)
  }

  test("lshTopK: same bucket recovers the planted near-duplicate") {
    val top = Similarity.lshTopK(vecs, "vec_id", "embedding", 0L, 3,
      dim = 8, nBits = 2)
    assert(top.collect().map(_.getLong(0)).contains(10L))
  }

  test("ivfTopK: coarse quantizer probe finds the planted near-duplicate") {
    val idx = Similarity.ivfIndex(vecs, "embedding", kClusters = 3)
    val top = Similarity.ivfTopK(idx, "vec_id", "embedding", 0L, 3, nProbe = 2)
    assert(top.collect().map(_.getLong(0)).contains(10L))
  }

  test("nearDupPairs: finds only the planted pair at high threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      dim = 8, threshold = 0.99, nBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 10L)))
  }
}
