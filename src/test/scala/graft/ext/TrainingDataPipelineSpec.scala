package graft.ext

import graft.SparkSpec
import graft.queries.Q
import org.apache.spark.sql.functions._

class TrainingDataPipelineSpec extends SparkSpec {

  test("curation funnel on the documents fixture is monotone and consistent") {
    val docs = Q.t(spark, sfDir("0.01"), "documents")
    val r = TrainingDataPipeline(docs)
    val s = r.stats.head()
    val (n0, nf, ne, nc) =
      (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
    assert(n0 == 500)
    assert(n0 >= nf && nf >= ne && ne >= nc, s"funnel not monotone: $s")
    assert(nc > 0)
    assert(r.curated.count() == nc)
    assert(s.getLong(4) > 0) // total tokens
  }

  test("near-duplicates are gone from the curated output") {
    val docs = Q.t(spark, sfDir("0.01"), "documents")
    val r = TrainingDataPipeline(docs)
    val pairs = Dedup.minHashPairs(r.curated, "doc_id", "text", threshold = 0.7)
    assert(pairs.count() == 0, "curated corpus still has near-dup pairs")
  }

  test("planted junk and duplicates are removed, clean prose kept") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders into the quiet village where people gather for the morning " +
      "market under clear skies with fresh bread and warm coffee for everyone"
    val docs = Seq(
      (1L, prose),
      (2L, prose), // exact dup
      (3L, prose.replace("coffee", "tea")), // near dup
      (4L, "x"), // too short
      (5L, "0101 1010 0101 1010 0101 1010 0101 1010 0101 1010") // junk digits
    ).toDF("doc_id", "text")
    val r = TrainingDataPipeline(docs)
    val kept = r.curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"kept $kept")
  }
}
