package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick semantics, hand-computed: nested patterns via output
  * links, overlapping self-matches, fail-link traversal, and parity
  * between the codegen Column path and an independent brute force.
  */
class MultiPatternCountsSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String, pats: Seq[String]): Seq[Long] = {
    val a = MultiPatternCounts.build(pats)
    MultiPatternCounts.compute(UTF8String.fromString(text), a)
      .toLongArray().toSeq
  }

  /** Independent overlapping-count brute force (the oracle's rule). */
  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("the classic dictionary: he/she/his/hers over 'ushers'") {
    // she ends at 3, he ends at 3 (suffix of she — output link), hers
    // ends at 5; his never matches
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping self-matches and nested patterns") {
    assert(counts("aaaa", Seq("a", "aa", "aaa")) === Seq(4L, 3L, 2L))
    // nesting chain: every 'table' also contains 'tab', 'ta', 'a'
    assert(counts("table table", Seq("a", "ta", "tab", "table")) ===
      Seq(2L, 2L, 2L, 2L))
    // fail-link walk mid-pattern: 'shis' breaks out of 'she' into 'his'
    assert(counts("shis", Seq("she", "his")) === Seq(0L, 1L))
  }

  test("matches the brute force on corpus-like text, incl. cross-word " +
    "patterns; Column path == driver walk") {
    val pats = Seq("a", "ta", "tab", "table", "an", "scan", "art",
      "part", "row", "val", "value", "s s", "e t")
    val texts = Seq(
      "key agg row scan slow fast table value part hash value",
      "batch window spark order data column agg join small line",
      "s s s", "", "t")
    for (t <- texts)
      assert(counts(t, pats) === pats.map(p => brute(t, p)),
        s"text '$t'")
    val got = texts.toDF("t")
      .select(call_function("multi_pattern_counts", col("t"),
        typedLit(pats)).as("c"))
      .as[Seq[Long]].collect().toSeq
    assert(got === texts.map(t => pats.map(p => brute(t, p))))
  }

  test("property: random dense-alphabet texts and pattern sets match " +
    "the brute force (automaton construction is the subtle part)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny alphabet → heavy pattern nesting, shared prefixes, and
    // fail-link traffic; sampled explicitly (the offline-cache bridge
    // caveat, CleaningPropertiesSpec pattern)
    val alpha = Gen.oneOf('a', 'b', 'c', ' ')
    def str(maxLen: Int): Gen[String] =
      Gen.choose(0, maxLen).flatMap(n => Gen.listOfN(n, alpha))
        .map(_.mkString)
    val case_ = for {
      t <- str(120)
      ps <- Gen.nonEmptyListOf(str(4).suchThat(_.nonEmpty))
    } yield (t, ps.distinct.take(12))
    (1 to 60).foreach { i =>
      case_.apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (t, ps) =>
          assert(counts(t, ps) === ps.map(p => brute(t, p)),
            s"seed $i text '$t' patterns $ps")
      }
    }
  }
}
