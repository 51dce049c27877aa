package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE vocabulary learning: symbolization, greedy left-to-right merge fold
  * semantics (including the same-symbol run case the string-replace
  * formulation gets wrong), and end-to-end merge learning determinism.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("symbolize splits a word into '|'-joined characters") {
    val out = Seq("low", "a", "").toDF("w")
      .select(Bpe.symbolize(col("w")).as("s")).as[String].collect()
    assert(out.toSeq == Seq("l|o|w", "a", ""))
  }

  test("applyMerge merges every non-overlapping occurrence, greedy LTR") {
    val syms = Seq(
      "l|o|w|o|w", // two occurrences
      "o|w",       // whole word becomes one symbol
      "w|o",       // reversed pair untouched
      "x"          // single symbol untouched
    ).toDF("sym")
    val out = syms.select(Bpe.applyMerge(col("sym"), "o", "w").as("m"))
      .as[String].collect()
    assert(out.toSeq == Seq("l|ow|ow", "ow", "w|o", "x"))
  }

  test("applyMerge same-symbol run is greedy left-to-right: a×5 → aa|aa|a") {
    val out = Seq("a|a|a|a|a").toDF("sym")
      .select(Bpe.applyMerge(col("sym"), "a", "a").as("m"))
      .as[String].collect()
    assert(out.head == "aa|aa|a")
  }

  test("applyMerge matches whole symbols only, never suffixes") {
    // last symbol 'ba' must NOT match a merge on ('a','b')
    val out = Seq("x|ba|b").toDF("sym")
      .select(Bpe.applyMerge(col("sym"), "a", "b").as("m"))
      .as[String].collect()
    assert(out.head == "x|ba|b")
  }

  test("learnMerges: deterministic ranks, counts, and tie-break") {
    // freq-weighted: 'aaab' ×3, 'ab' ×2 → round 1 (a,a)=6 beats (a,b)=5
    // round 2: aa|a|b gives (aa,a)=3 and (a,b)=3, plus a|b gives (a,b)=2
    //          → (a,b)=5 wins; round 3: aa|ab leaves only (aa,ab)=3
    val docs = Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaab ab")
    ).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", nMerges = 3, topWords = 10)
    assert(ms.map(m => (m.rank, m.left, m.right, m.count)) == Seq(
      (1, "a", "a", 6L),
      (2, "a", "b", 5L),
      (3, "aa", "ab", 3L)))
  }

  test("learnMerges stops early when words are fully merged") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", nMerges = 5, topWords = 10)
    assert(ms.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("encodeVocab applies merges in order; pieces counted post-fold") {
    val words = Seq("aab", "ab", "xy").toDF("w")
    val merges = Seq(
      Bpe.Merge(1, "a", "a", 0L),
      Bpe.Merge(2, "aa", "b", 0L))
    val out = Bpe.encodeVocab(words, "w", merges)
      .select("w", "sym", "n_pieces")
      .as[(String, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("aab") == (("aab", 1L))) // a|a|b → aa|b → aab
    assert(out("ab") == (("a|b", 2L))) // untouched by both merges
    assert(out("xy") == (("x|y", 2L)))
  }

  test("learnMerges ignores non-[a-z]+ and single-char words") {
    val docs = Seq((1L, "a b c 123 x9 zz zz")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", nMerges = 2, topWords = 10)
    assert(ms.map(m => (m.left, m.right, m.count)) == Seq(("z", "z", 2L)))
  }
}
