package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the q163–q167 wave: feature hashing, RRF fusion, and the
  * group-safe split (chi2 and trigrams live in FeaturePrepSpec /
  * BehaviorSpec).
  */
class FusionSplitSpec extends SparkSpec {
  import spark.implicits._

  test("featureHashBuckets: conserves token mass, bounded bucket ids") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta delta"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.featureHashBuckets(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._2).sum == 6L) // 6 tokens total
    assert(out.forall(r => r._1 >= 0 && r._1 < 8))
    assert(out.forall(r => r._3 <= 2L)) // no token appears in 3 docs
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4) // shares sum to 1
    // same token, same bucket: alpha's 2 occurrences land together
    val alphaBucket = TextAnalysis.featureHashBuckets(
      Seq((9L, "alpha alpha")).toDF("doc_id", "text"), "doc_id", "text", 8)
      .collect()
    assert(alphaBucket.length == 1 && alphaBucket.head.getLong(1) == 2L)
  }

  test("rrfFuse: hand-built vectors fuse ranks with id tie-break") {
    // q1 = e1-axis, q2 = e2-axis; v10 is rank-2 in BOTH lists, v11/v12 are
    // rank-1 in one and rank-3 in the other. By AM-HM, 1/61 + 1/63 > 2/62,
    // so RRF legitimately ranks the 1+3 candidates above the 2+2 one; the
    // v11/v12 tie (equal scores) breaks to the lower id.
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    val rows = Seq(
      (1L, v(1, 0, 0)), (2L, v(0, 1, 0)),
      (10L, v(1, 1, 0.1)), (11L, v(1, 0.1, 0)), (12L, v(0.1, 1, 0)),
      (13L, v(0, 0, 1))
    ).toDF("vec_id", "embedding")
    val out = Similarity.rrfFuse(rows, "vec_id", "embedding",
      queryIds = Seq(1L, 2L), listSize = 3, kRrf = 60, topN = 5)
      .as[(Long, Long, Long, Double)].collect()
    // each query's own top-3: q1 -> 11, 10, 2... compute: cos(q1, 11) ~ .995,
    // cos(q1, 10) ~ .705, cos(q1, 2)=0, cos(q1,12)~.0995, cos(q1,13)=0
    // list1: 11(r1), 10(r2), 12(r3); list2: 12(r1), 10(r2), 11(r3)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(10L)._2 == 2L && byId(10L)._3 == 2L)
    assert(out.head._1 == 11L) // 1/61 + 1/63 > 2/62; id 11 < 12 on the tie
    assert(out.map(_._1).take(3).toSeq == Seq(11L, 12L, 10L))
    // ranks of one-sided ids: present in both lists here (size-3 lists)
    assert(byId(11L)._2 == 1L && byId(11L)._3 == 3L)
    assert(byId(12L)._2 == 3L && byId(12L)._3 == 1L)
    // score is the explicit two-term sum
    assert(math.abs(byId(10L)._4 - (1.0 / 62 + 1.0 / 62)) < 1e-6)
  }

  test("rrfFuse: candidate missing from one list scores a single term") {
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val rows = Seq(
      (1L, v(1, 0)), (2L, v(0, 1)),
      (10L, v(1, 0.01)), (11L, v(0.01, 1))
    ).toDF("vec_id", "embedding")
    val out = Similarity.rrfFuse(rows, "vec_id", "embedding",
      queryIds = Seq(1L, 2L), listSize = 1, kRrf = 60, topN = 10)
      .as[(Long, Long, Long, Double)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // listSize=1: list1 = [10], list2 = [11]; absent rank reported as 0
    assert(byId(10L)._2 == 1L && byId(10L)._3 == 0L)
    // operator rounds the fused score to 6 dp (Similarity.rrfFuse), so the
    // tolerance must absorb up to 5e-7 of rounding — not 1e-9
    assert(math.abs(byId(10L)._4 - 1.0 / 61) < 1e-6)
  }

  test("groupSafeSplit: duplicate content never straddles splits") {
    val docs = (1 to 300).map { i =>
      // 100 distinct contents, each duplicated 3x with different ids
      (i.toLong, s"content body number ${i % 100}")
    }.toDF("doc_id", "text")
    val out = Sampling.groupSafeSplit(docs, "doc_id", "text")
      .as[(String, Long, Long, Double, Long)].collect()
    assert(out.map(_._2).sum == 300L)
    assert(out.map(_._3).sum == 100L)
    assert(out.forall(_._5 == 1L)) // the no-leakage pin
    // every group's 3 copies land whole: n_docs = 3 * n_groups per split
    assert(out.forall(r => r._2 == 3 * r._3))
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4)
  }
}
