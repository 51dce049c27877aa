package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

class WordGramHashesSpec extends SparkSpec {

  test("word_gram_hashes: degenerate cases match wordNgrams cardinalities") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a b c d")),   // 2 trigrams
      (2L, Some("a b")),       // < n → one whole-sequence gram
      (3L, Some("x")),         // single token → one gram
      (4L, Some("   ")),       // zero tokens → empty
      (5L, None),              // null → null
      (6L, Some("a b a b a")) // duplicate grams collapse ("a b a" ×2)
    ).toDF("id", "text")
    val out = df.select(col("id"),
        call_function("word_gram_hashes",
          graft.ext.TextAnalysis.tokens(col("text")), lit(3)).as("gh"))
      .select(col("id"),
        when(col("gh").isNull, lit(-1)).otherwise(size(col("gh"))).as("n"))
      .orderBy("id").as[(Long, Int)].collect().map(_._2)
    assert(out.toSeq === Seq(2, 1, 1, 0, -1, 2))
  }

  test("word_gram_hashes: set cardinality equals the string-gram form on corpus text") {
    // same DISTINCT-gram count per doc as wordNgrams (bijective up to
    // 64-bit collisions) — the property every consumer relies on
    val docs = spark.read.parquet(s"${sfDir()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = docs.select(col("doc_id"),
      size(call_function("word_gram_hashes",
        graft.ext.TextAnalysis.tokens(col("text")), lit(3))).as("n"))
    val strings = docs.select(col("doc_id"),
      size(Dedup.wordNgrams(col("text"), 3)).as("n"))
    val diff = native.alias("a").join(strings.alias("b"), "doc_id")
      .filter(col("a.n") =!= col("b.n"))
    assert(diff.count() === 0L)
  }

  test("word_gram_hashes: overlap counts are hash-family independent") {
    // pairwise overlap via hashes == overlap via gram strings
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "quick brown fox leaps high"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    def overlaps(gram: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      gram.alias("a").join(gram.alias("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("l"), col("b.doc_id").as("r"))
        .agg(count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect()
        .map { case (l, r, c) => (l, r) -> c }.toMap
    val viaHash = overlaps(df.select(col("doc_id"),
      explode(call_function("word_gram_hashes",
        graft.ext.TextAnalysis.tokens(col("text")), lit(3))).as("g")))
    val viaString = overlaps(df.select(col("doc_id"),
      explode(Dedup.wordNgrams(col("text"), 3)).as("g")))
    assert(viaHash === viaString)
    assert(viaHash.nonEmpty)
  }
}
