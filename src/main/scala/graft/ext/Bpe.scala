package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning (the Sennrich
  * word-frequency formulation): the corpus-scale pass collapses 100 TB of
  * text into a compact (word, frequency) dictionary — ONE shuffle, sized by
  * vocabulary not corpus — and every merge iteration then runs on that
  * dictionary alone (≤ `topWords` rows), so learning k merges costs one
  * corpus scan plus k trivially small aggregates. This is exactly how
  * production tokenizer training distributes: the corpus contributes only
  * word counts.
  *
  * Merge semantics are the classic greedy left-to-right fold: within a
  * word, every non-overlapping occurrence of the chosen pair merges in one
  * pass, scanning left to right (a run "a a a" under pair (a,a) becomes
  * "aa a"). The fold is expressed identically in Spark (`aggregate` HOF
  * with a string accumulator over '|'-separated symbols) and in the DuckDB
  * oracle (`list_reduce` with the same accumulator), which is what makes
  * the learned merge table exactly hash-checkable — symbols are restricted
  * to `[a-z]+` words so the '|' separator and LIKE patterns are safe.
  *
  * Tie-breaking is deterministic: highest pair count, then lexicographic
  * (left, right).
  */
object Bpe {

  /** '|'-joined character symbolization of a word ("low" → "l|o|w").
    * Empty-guarded: Spark's sequence(1, 0) counts DOWN, so an unguarded
    * empty string would symbolize to "|".
    */
  def symbolize(w: Column): Column =
    when(length(w) === 0, lit(""))
      .otherwise(concat_ws("|",
        transform(sequence(lit(1), length(w).cast("int")),
          i => w.substr(i, lit(1)))))

  /** Apply one learned merge (a,b) → ab to a `sep`-separated symbol
    * string, greedy left-to-right. String accumulator: the last symbol
    * of the accumulated prefix is `a` iff the prefix IS `a` or ends
    * with sep+a — safe because symbols never contain the separator
    * ('|' for the word-level path, U+0400 for the byte-level path,
    * chosen outside the byte-encoder image).
    */
  def applyMerge(sym: Column, a: String, b: String,
      sep: String = "|"): Column = {
    val arr = split(sym, java.util.regex.Pattern.quote(sep))
    val rest = slice(arr, lit(2), greatest(size(arr) - 1, lit(0)))
    aggregate(rest, element_at(arr, 1),
      (acc, x) =>
        when((acc === lit(a) || acc.endsWith(lit(sep + a))) && x === lit(b),
          concat(acc.substr(lit(1), length(acc) - lit(a.length)), lit(a + b)))
          .otherwise(concat(acc, lit(sep), x)))
  }

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Encode a distinct-word vocabulary with an ordered merge list: adds
    * `sym` (the post-merge '|'-separated symbols) and `n_pieces`. Encoding
    * runs on the VOCABULARY, not the corpus — the scale-right shape: a
    * 100 TB corpus contributes word instances, but the fold runs once per
    * word TYPE and the resulting (word → n_pieces) map broadcasts back
    * over the token stream. Word types are bounded (~1e6-1e7 for web text);
    * if the map outgrows broadcast, the join degrades to a hash shuffle of
    * 8-byte word hashes, never of documents.
    */
  def encodeVocab(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    // ONE PROJECTION PER MERGE, not one nested expression: an `aggregate`
    // HOF re-evaluates an INLINE array argument per element (the q84
    // rule), so folding k merges into a single expression tree makes
    // level i re-run the whole chain below it per symbol — measured 49 s
    // for 8 merges over a 31k-word vocab where the materialized chain
    // runs in under a second. Each step's alias is a non-cheap
    // projection CollapseProject keeps, so the fold input is always an
    // attribute.
    val start = words.withColumn("sym", symbolize(col(wordCol)))
    val folded = merges.foldLeft(start) { (df, m) =>
      df.withColumn("sym", applyMerge(col("sym"), m.left, m.right))
    }
    folded.withColumn("n_pieces",
      size(split(col("sym"), "\\|")).cast("long"))
  }

  // ---- GPT-2 byte-level lineage (r11, VERDICT r10 #4) ---------------

  /** The published GPT-2 pretokenizer regex: contractions, optional-
    * space-prefixed letter/number/punctuation runs, then whitespace
    * (with a lookahead that splits trailing runs) — Java regex, run
    * verbatim. This is the segmentation that byte-level merges apply
    * within; word-level `tokens()` is NOT it (leading spaces are part
    * of the token — "Ġthe" and "the" are different vocabulary items).
    */
  val Gpt2PretokenRegex: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+|" +
      " ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** Array of GPT-2 pretokens of `c` (the matches of the published
    * regex, in order — concatenation restores the input exactly).
    */
  def gpt2Pretokenize(c: Column): Column =
    regexp_extract_all(c, lit(Gpt2PretokenRegex), lit(0))

  /** Byte-level symbol separator (U+0400, outside the byte-encoder
    * image) — the byte path's '|'.
    */
  val ByteSep: String = graft.functions.Gpt2ByteSym.Sep.toString

  /** Byte-level symbolization: UTF-8 bytes mapped through the GPT-2
    * bytes→unicode table, ByteSep-joined (native expression).
    */
  def byteSymbolize(c: Column): Column =
    call_function("gpt2_byte_sym", c)

  /** Byte-level [[encodeVocab]]: encode a distinct-PRETOKEN vocabulary
    * with an ordered byte-level merge list (entries over byte-encoder
    * symbols, e.g. ("Ġ","t")). Same one-projection-per-merge shape; the
    * vocabulary grain means a 100 TB corpus still folds once per
    * pretoken TYPE.
    */
  def encodeVocabBytes(pretokens: DataFrame, colName: String,
      merges: Seq[Merge]): DataFrame = {
    val start = pretokens.withColumn("sym", byteSymbolize(col(colName)))
    val folded = merges.foldLeft(start) { (df, m) =>
      df.withColumn("sym", applyMerge(col("sym"), m.left, m.right, ByteSep))
    }
    folded.withColumn("n_pieces",
      size(split(col("sym"), java.util.regex.Pattern.quote(ByteSep)))
        .cast("long"))
  }

  /** Render an ordered merge list as the GPT-2-lineage `merges.txt`
    * format [[loadMergesFile]] parses: a `#version` comment header, then
    * one "left right" pair per line — rank IS the line order.
    */
  def mergesFileLines(merges: Seq[(String, String)]): Seq[String] =
    "#version: 0.2" +: merges.map { case (a, b) => s"$a $b" }

  /** Parse a published `merges.txt`: `#`-comment lines skipped, each
    * remaining line "left right", rank = order of appearance. Reads
    * through the Hadoop FS layer (local/HDFS/object store); a 50k-merge
    * file is a bounded driver-side collect (the vocab-file precedent).
    * Real pipelines tokenize with a FIXED published merge table, not a
    * corpus-learned one — this is that input path.
    */
  def loadMergesFile(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
      .map { case (l, i) =>
        val parts = l.split(" ")
        require(parts.length == 2,
          s"merges.txt line ${i + 1} is not 'left right': $l")
        Merge(i + 1, parts(0), parts(1), 0L)
      }

  /** Learn the first `nMerges` BPE merges from the corpus' `topWords` most
    * frequent `[a-z]{2,}` words (frequency-desc, word-asc deterministic
    * cut). Pair counts are frequency-weighted, as in standard BPE.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      topWords: Int
  ): Seq[Merge] = {
    val words = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).cast("long").as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topWords)
    var vocab = words
      .select(symbolize(col("w")).as("sym"), col("c"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val top = vocab
        .select(col("c"), split(col("sym"), "\\|").as("_t"))
        .select(col("c"), col("_t"),
          explode(when(size(col("_t")) > 1,
            sequence(lit(1), size(col("_t")) - 1))
            .otherwise(array().cast("array<int>"))).as("i"))
        .select(element_at(col("_t"), col("i")).as("l"),
          element_at(col("_t"), col("i") + 1).as("r"), col("c"))
        .groupBy("l", "r").agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
        out += Merge(r, a, b, cnt)
        vocab = vocab
          .select(applyMerge(col("sym"), a, b).as("sym"), col("c"))
          .localCheckpoint()
        r += 1
      }
    }
    out.toSeq
  }
}
