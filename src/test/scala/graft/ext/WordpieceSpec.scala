package graft.ext

import graft.SparkSpec
import graft.functions.WordpieceStats
import org.apache.spark.sql.functions._

/** WordPiece greedy longest-match semantics, hand-computed: piece
  * boundaries, the ##-continuation rule, UNK rules, the checksum
  * definition, and the vocab derivation — plus Column/driver parity.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  // vocab seeded by one word: "hello"
  private val (whole, cont) = Wordpiece.vocabPieces(Seq("hello"))

  private def seg(word: String): (Long, Long, Long) = {
    val r = WordpieceStats.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(word),
      WordpieceStats.vocab(whole, cont))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }
  private def h(rendered: String): Long = WordpieceStats.pieceHash(rendered)

  test("vocab derivation: prefixes whole, interior substrings cont, " +
    "charset both ways") {
    assert(whole.contains("hello") && whole.contains("hel") &&
      !whole.contains("ello"))
    assert(cont.contains("ello") && cont.contains("ll") &&
      !cont.contains("hello")) // interior substrings never start at 0
    assert(whole.contains("x") && cont.contains("x")) // charset floor
    assert(whole.contains("h") && cont.contains("h"))
  }

  test("greedy longest-match boundaries and the checksum, by hand") {
    // the seed word is one whole piece
    assert(seg("hello") === ((1L, 0L, h("hello"))))
    // trailing char: [hello][##x]
    assert(seg("hellox") === ((2L, 0L, h("hello") + 2 * h("##x"))))
    // leading char: [x][##h][##ello] — "hello" is NOT a continuation, so
    // the greedy walk takes the char then the longest interior substring
    assert(seg("xhello") ===
      ((3L, 0L, h("x") + 2 * h("##h") + 3 * h("##ello"))))
    // unseeded word falls apart into chars: [a][##b][##c]
    assert(seg("abc") === ((3L, 0L, h("a") + 2 * h("##b") + 3 * h("##c"))))
    // longest beats first: [hell][##x], not char-by-char
    assert(seg("hellx") === ((2L, 0L, h("hell") + 2 * h("##x"))))
  }

  test("UNK rules: length cap, non-printable-ASCII, empty") {
    assert(seg("a" * 17) === ((1L, 1L, 0L)))
    assert(seg("a" * 16)._2 === 0L) // exactly at the cap segments fine
    assert(seg("héllo") === ((1L, 1L, 0L)))
    assert(seg("ab\u0001c") === ((1L, 1L, 0L))) // control char
    assert(seg("") === ((0L, 0L, 0L)))
  }

  test("Column path == driver walk; census totals on a tiny corpus") {
    val words = Seq("hello", "hellox", "xhello", "abc", "héllo")
    val got = words.toDF("w")
      .select(Wordpiece.stats(col("w"), whole, cont).as("s"))
      .select("s.n_pieces", "s.unk", "s.chk")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === words.map(seg))

    // census: sources weight by occurrence; n_tokens counts every token
    val docs = Seq(
      ("a", "hello hello abc"), // 3 tokens, pieces 1+1+3
      ("b", "héllo hellox")     // 2 tokens, 1 UNK
    ).toDF("source", "text")
    val c = Wordpiece.encodeCensus(docs, "text", "source",
        topK = 1) // "hello" is the most frequent word → same vocab
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (s, a, b, u, k) => s -> ((a, b, u, k)) }.toMap
    assert(c("a") === ((3L, 5L, 0L, 2 * h("hello") + seg("abc")._3)))
    assert(c("b") === ((2L, 3L, 1L, seg("hellox")._3)))
  }

  test("external vocab file: BERT-style round trip (## prefix, specials " +
    "skipped) and segmentation under the loaded vocabulary") {
    val wholeExt = Seq("th", "the", "value") ++ Wordpiece.Charset
    val contExt = Seq("ing", "ed") ++ Wordpiece.Charset
    val lines = Wordpiece.vocabFileLines(wholeExt, contExt)
    assert(lines.take(2) === Seq("[PAD]", "[UNK]"))
    assert(lines.contains("##ing") && lines.contains("the"))
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab")
    val p = dir.resolve("vocab.txt")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    val (w, c) = Wordpiece.loadVocabFile(spark, p.toString)
    assert(w.toSet === wholeExt.toSet) // specials never come back
    assert(c.toSet === contExt.toSet)  // ## stripped exactly once
    // greedy walk under the loaded vocab: "thing" → [th][##ing]
    val r = WordpieceStats.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("thing"),
      WordpieceStats.vocab(w, c))
    assert((r.getLong(0), r.getLong(1)) === ((2L, 0L)))
    assert(r.getLong(2) === h("th") + 2 * h("##ing"))
    // census under explicit pieces matches the derived-vocab machinery
    val docs = Seq(("a", "thing the valued")).toDF("source", "text")
    val row = Wordpiece.encodeCensusPieces(docs, "text", "source", w, c)
      .as[(String, Long, Long, Long, Long)].head()
    // thing=[th][##ing], the=[the], valued=[value][##d]
    assert(row === (("a", 3L, 5L, 0L,
      (h("th") + 2 * h("##ing")) + h("the") + (h("value") + 2 * h("##d")))))
  }
}
