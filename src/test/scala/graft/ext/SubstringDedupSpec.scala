package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the substring-level dedup wave: exact window spans (q171),
  * winnowed fingerprint candidates (q172), and the hashed-token domain
  * score (q174).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val shared =
    "the quick brown fox jumps over the lazy dog again and again tonight"

  test("substringDupSpans finds the shared passage and nothing else") {
    val a = s"AAAA $shared BBBBBBBBBBBBBBBBBBBBBBBBBBBBBB"
    val b = s"CCCCCCCCCCCCCCCCCCCCCC $shared DDDDDDDDDDDD"
    val u = "totally unrelated text that repeats nothing from the others " +
      "and is long enough to window over without any duplicate content"
    val out = Dedup.substringDupSpans(
      Seq((1L, a), (2L, b), (3L, u)).toDF("doc_id", "text"),
      "doc_id", "text", k = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 3: no dup windows at all
    assert(out(3L)._2 == 0L && out(3L)._4 == 0L)
    // docs 1/2: exactly one dup span covering the shared passage PLUS its
    // flanking spaces (both docs embed " <shared> ", so the true shared
    // substring is 2 chars longer than the passage itself)
    val span = shared.length + 2
    for (id <- Seq(1L, 2L)) {
      val (_, nDup, nSpans, maxSpan) = out(id)
      assert(nSpans == 1L, s"doc $id spans")
      assert(maxSpan == span.toLong, s"doc $id span chars")
      assert(nDup == (span - 40 + 1).toLong)
    }
  }

  test("winnowing guarantee: a >= k+w-1 shared passage always pairs") {
    // k=40, w=8: guarantee kicks in at 47 shared chars; `shared` is longer
    val docs = Seq(
      (1L, s"XXXXXXXX $shared YYYYYYYYYYYYYYYYYYYY"),
      (2L, s"ZZZZZZZZZZZZZZZZZZZZZZZZZ $shared WWWW"),
      (3L, "completely different content with no overlap whatsoever " +
        "padded out to be comfortably beyond the window threshold")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowedCandidatePairs(docs, "doc_id", "text",
      k = 40, w = 8, minShared = 1, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // portable and production hash families agree on the pair structure
    val prod = Dedup.winnowedCandidatePairs(docs, "doc_id", "text",
      k = 40, w = 8, minShared = 1, portable = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prod.contains((1L, 2L)))
  }

  test("domainScore separates token-disjoint domains exactly") {
    val target = (0 until 10).map(i => (i.toLong, "alpha beta gamma delta"))
    val rest = (10 until 30).map(i => (i.toLong, "omega sigma tau phi"))
    val df = (target ++ rest).toDF("doc_id", "text")
    val out = TextAnalysis.domainScore(df, "doc_id", "text",
        col("doc_id") < 10, nBuckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // token-disjoint corpora: every target doc scores positive (its
    // buckets have nr=0), every rest doc negative (nt=0)
    (0L until 10L).foreach(id => assert(out(id)._1 > 0 && out(id)._2 == 1L))
    (10L until 30L).foreach(id => assert(out(id)._1 < 0 && out(id)._2 == 0L))
  }
}
