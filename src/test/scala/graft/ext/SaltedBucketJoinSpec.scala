package graft.ext

import graft.{Compare, SparkSpec}
import graft.queries.Q

/** The deterministic hot-bucket skew split (Similarity.saltedBucketJoin)
  * must be a pure re-planning: the join output multiset — and therefore
  * every downstream argmax / window rank — is IDENTICAL with and without
  * the salt. A tiny threshold forces the salted path on every bucket, so
  * the identity is checked on the path that actually splits.
  */
class SaltedBucketJoinSpec extends SparkSpec {

  private def emb = Q.t(spark, sfDir(), "embeddings")

  test("hardNegativesLsh: salted plan output == unsalted plan output") {
    val plain = Similarity.hardNegativesLsh(
      emb, "vec_id", "embedding", "label", dim = 64, nBits = 6,
      probeHamming = 1)
    val salted = Similarity.hardNegativesLsh(
      emb, "vec_id", "embedding", "label", dim = 64, nBits = 6,
      probeHamming = 1, saltBucketsAbove = 5)
    assert(plain.count() > 0)
    Compare.assertSameData(salted, plain, sortCols = Seq("vec_id"))
  }

  test("knnJoin: salted plan output == unsalted plan output") {
    val plain = Similarity.knnJoin(
      emb, emb, "vec_id", "embedding", k = 3, dim = 64, nBits = 6,
      probeHamming = 1)
    val salted = Similarity.knnJoin(
      emb, emb, "vec_id", "embedding", k = 3, dim = 64, nBits = 6,
      probeHamming = 1, saltBucketsAbove = 5)
    assert(plain.count() > 0)
    Compare.assertSameData(salted, plain, sortCols = Seq("q_id", "rank"))
  }

  test("threshold larger than any bucket leaves the plain plan output") {
    val plain = Similarity.knnJoin(
      emb, emb, "vec_id", "embedding", k = 2, dim = 64, nBits = 6)
    val salted = Similarity.knnJoin(
      emb, emb, "vec_id", "embedding", k = 2, dim = 64, nBits = 6,
      saltBucketsAbove = Int.MaxValue)
    Compare.assertSameData(salted, plain, sortCols = Seq("q_id", "rank"))
  }
}
