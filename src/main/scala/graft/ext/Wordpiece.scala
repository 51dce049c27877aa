package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-family tokenization (the BERT lineage, next to [[Bpe]]'s
  * GPT-lineage merges): greedy longest-match-first segmentation of each
  * word against a subword vocabulary — whole-word pieces at position 0,
  * `##`-continuation pieces after (Wu et al. 2016; the reference rule of
  * every BERT tokenizer).
  *
  * The vocabulary here is DERIVED, deterministically, from the corpus
  * itself: the top-K words (occurrence count desc, word asc; printable
  * ASCII, ≤ 16 chars) contribute their prefixes as whole pieces and
  * their interior substrings as continuations, plus the printable-ASCII
  * single characters both ways — so segmentation always terminates and
  * both engines can rebuild the identical vocabulary relationally
  * (q243's oracle does).
  *
  * Scale shape: segmentation runs on DISTINCT words only (the native
  * `wordpiece_stats` expression — vocabulary rides the plan as a payload
  * map, one greedy walk per word); occurrence counts join back on the
  * word. Cost is vocabulary-bound, not corpus-bound: a 100× replicated
  * corpus re-segments nothing.
  */
object Wordpiece {

  /** Printable-ASCII single-character pieces — the termination floor. */
  val Charset: Seq[String] = (33 to 126).map(_.toChar.toString)

  /** Top-K vocabulary seed words (bounded driver-side collect — the
    * codebook/key-profile precedent).
    */
  def topWords(docs: DataFrame, textCol: String, topK: Int = 40,
      maxWordChars: Int = 16): Seq[String] =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordChars &&
        octet_length(col("word")) === length(col("word")))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topK)
      .select("word").collect().map(_.getString(0)).toSeq

  /** (whole pieces, continuation pieces) from the seed words: prefixes ∪
    * charset, interior substrings ∪ charset. Raw texts — the `##` is
    * applied at render/hash time.
    */
  def vocabPieces(seedWords: Seq[String]): (Seq[String], Seq[String]) = {
    val whole = (seedWords.flatMap(w =>
      (1 to w.length).map(l => w.substring(0, l))) ++ Charset)
      .distinct.sorted
    val cont = (seedWords.flatMap(w =>
      (1 until w.length).flatMap(i =>
        (1 to w.length - i).map(l => w.substring(i, i + l)))) ++ Charset)
      .distinct.sorted
    (whole, cont)
  }

  /** `struct(n_pieces, unk, chk)` column for a word column under the
    * given vocabulary (the native expression; piece arrays are consumed
    * into a payload at analysis time).
    */
  def stats(word: Column, whole: Seq[String], cont: Seq[String]): Column =
    call_function("wordpiece_stats", word, typedLit(whole), typedLit(cont))

  /** Corpus subword census per `sourceCol`: whitespace tokens, subword
    * tokens under the derived vocabulary, `[UNK]` tokens, and the
    * portable segmentation checksum (Σ occurrences · Σ step·h(piece) —
    * pins every piece SEQUENCE, not just counts).
    */
  def encodeCensus(docs: DataFrame, textCol: String, sourceCol: String,
      topK: Int = 40, maxWordChars: Int = 16): DataFrame = {
    val (whole, cont) = vocabPieces(topWords(docs, textCol, topK,
      maxWordChars))
    encodeCensusPieces(docs, textCol, sourceCol, whole, cont)
  }

  /** The census under an EXPLICIT vocabulary — the real-pipeline path:
    * production tokenization uses a fixed published vocab (30k pieces),
    * not a corpus-derived one. Same scale shape: segmentation runs once
    * per DISTINCT word (vocabulary rides the plan as a payload map), so
    * cost is distinct-word-bound regardless of vocab size or corpus
    * replication.
    */
  def encodeCensusPieces(docs: DataFrame, textCol: String,
      sourceCol: String, whole: Seq[String], cont: Seq[String]): DataFrame = {
    val occ = docs.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("occ"))
    val seg = occ.select("word").distinct()
      .withColumn("_s", stats(col("word"), whole, cont))
      .select(col("word"), col("_s.n_pieces").as("n_pieces"),
        col("_s.unk").as("unkf"), col("_s.chk").as("wchk"))
    occ.join(seg, "word")
      .groupBy("source")
      .agg(sum(col("occ")).cast("long").as("n_tokens"),
        sum(col("occ") * col("n_pieces")).cast("long").as("subword_tokens"),
        sum(col("occ") * col("unkf")).cast("long").as("n_unk_tokens"),
        sum(col("occ") * col("wchk")).cast("long").as("chk"))
      .orderBy("source")
  }

  /** Parse a BERT-style `vocab.txt`: one piece per line, `##`-prefixed
    * lines are continuation pieces, bracketed specials (`[UNK]`, `[CLS]`,
    * `[SEP]`, `[PAD]`, `[MASK]`, `[unused..]`) are control tokens that
    * never match raw text and are skipped. Reads through the Hadoop FS
    * layer, so local, HDFS, and object-store paths all work; a 30k-line
    * vocab is a bounded driver-side collect (the codebook precedent).
    */
  def loadVocabFile(spark: SparkSession, path: String): (Seq[String], Seq[String]) = {
    val lines = spark.read.textFile(path).collect().toSeq
      .map(_.trim).filter(_.nonEmpty)
      .filterNot(l => l.startsWith("[") && l.endsWith("]"))
    val (contLines, wholeLines) = lines.partition(_.startsWith("##"))
    (wholeLines.distinct,
      contLines.map(_.stripPrefix("##")).filter(_.nonEmpty).distinct)
  }

  /** Render a vocabulary as the `vocab.txt` format [[loadVocabFile]]
    * parses (specials first, BERT convention).
    */
  def vocabFileLines(whole: Seq[String], cont: Seq[String]): Seq[String] =
    Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]") ++
      whole ++ cont.map("##" + _)
}
