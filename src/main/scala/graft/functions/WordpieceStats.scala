package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WordPiece greedy longest-match-first
  * segmentation statistics of ONE word —
  * `struct(n_pieces, unk, chk)` — against a fixed subword vocabulary
  * (whole-word pieces for position 0, `##`-continuation pieces after).
  *
  * This is the BERT-family tokenizer rule: at each position take the
  * LONGEST vocabulary piece matching the remaining characters; a word
  * longer than `maxWordChars` (16 here, BERT uses 100) or containing a
  * non-ASCII character is emitted as a single `[UNK]`. The vocabulary
  * rides the expression as data (two hash maps piece → checksum addend,
  * the SrpBucket matrix-payload pattern) — the registered function's
  * literal piece arrays are CONSUMED by the builder, so plans carry a
  * shape tag, not thousands of string literals.
  *
  * `chk` pins the exact piece SEQUENCE cross-engine: Σ step·h(piece)
  * over steps 1.., where h = the portable md5 hash of the RENDERED piece
  * (`##`-prefixed beyond position 0) mod 1e6 — the Dedup.portableHash60
  * family, so a DuckDB twin replays the identical greedy walk and
  * checksum with no engine hash in sight. UNK words report (1, 1, 0).
  *
  * Scale note: the caller segments DISTINCT words only and joins counts
  * back (graft.ext.Wordpiece) — segmentation cost is vocabulary-bound,
  * not corpus-bound.
  */
@ExpressionDescription(
  usage = "_FUNC_(word, whole_pieces, cont_pieces) - struct(n_pieces, unk, chk) of greedy WordPiece segmentation.",
  examples = "> SELECT _FUNC_('hellox', array('hello', 'h'), array('x'));")
case class WordpieceStats(child: Expression, vocab: WordpieceVocab)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("unk", LongType, nullable = false),
    StructField("chk", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_stats expects a string word, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordpieceStats.compute(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("wordpieceMod", WordpieceStats,
      WordpieceStats.getClass.getName)
    val v = ctx.addReferenceObj("wordpieceVocab", vocab,
      classOf[WordpieceVocab].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $mod.compute($w, $v);")
  }

  override def prettyName: String = "wordpiece_stats"
  // plans print a shape tag, never the vocabulary
  override def toString: String = s"wordpiece_stats($child, ${vocab.tag})"
  override def sql: String = s"wordpiece_stats(${child.sql}, ${vocab.tag})"

  override protected def withNewChildInternal(newChild: Expression): WordpieceStats =
    copy(child = newChild)
}

/** The segmentation vocabulary payload: rendered-piece checksum addends
  * keyed by raw piece text, split into the position-0 (whole) and the
  * `##`-continuation maps, plus the longest piece length for the greedy
  * scan bound.
  */
final class WordpieceVocab(
    val whole: java.util.HashMap[String, java.lang.Long],
    val cont: java.util.HashMap[String, java.lang.Long],
    val maxPieceLen: Int,
    val maxWordChars: Int
) extends Serializable {
  def tag: String = s"<vocab ${whole.size}w+${cont.size}c>"
}

object WordpieceStats {

  /** Portable checksum addend of a rendered piece: first 15 hex chars of
    * md5 as a long (= DuckDB `('0x'||substr(md5(p),1,15))::BIGINT`),
    * mod 1e6 so step-weighted sums over billions of token occurrences
    * stay far inside int64.
    */
  def pieceHash(rendered: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(rendered.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
  }

  /** Build the payload from raw piece texts (continuations WITHOUT the
    * `##` prefix — it is applied to the rendered form for hashing).
    */
  def vocab(wholePieces: Seq[String], contPieces: Seq[String],
      maxWordChars: Int = 16): WordpieceVocab = {
    val w = new java.util.HashMap[String, java.lang.Long]()
    val c = new java.util.HashMap[String, java.lang.Long]()
    wholePieces.foreach(p => w.put(p, pieceHash(p)))
    contPieces.foreach(p => c.put(p, pieceHash("##" + p)))
    val maxLen =
      ((wholePieces.iterator ++ contPieces.iterator).map(_.length) ++
        Iterator(1)).max
    new WordpieceVocab(w, c, maxLen, maxWordChars)
  }

  /** Greedy longest-match walk — called from generated code. */
  def compute(word: UTF8String, vocab: WordpieceVocab): GenericInternalRow = {
    val w = word.toString
    val L = w.length
    def unk = new GenericInternalRow(Array[Any](1L, 1L, 0L))
    if (L == 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    if (L > vocab.maxWordChars) return unk
    // printable-ASCII words only (the charset the single-char pieces
    // cover; = the oracle's '^[!-~]+$') — anything else is one [UNK]
    var i = 0
    while (i < L) {
      val ch = w.charAt(i)
      if (ch < 33 || ch > 126) return unk
      i += 1
    }
    var pos = 0
    var n = 0L
    var chk = 0L
    while (pos < L) {
      val set = if (pos == 0) vocab.whole else vocab.cont
      var l = math.min(vocab.maxPieceLen, L - pos)
      var h: java.lang.Long = null
      while (l >= 1 && h == null) {
        h = set.get(w.substring(pos, pos + l))
        if (h == null) l -= 1
      }
      if (h == null) return unk // no piece (charset gaps): whole word UNK
      n += 1
      chk += n * h.longValue
      pos += l
    }
    new GenericInternalRow(Array[Any](n, 0L, chk))
  }

  /** Raw piece texts out of the registered function's foldable array
    * literals.
    */
  private[functions] def foldableStrings(e: Expression): Seq[String] = {
    require(e.foldable, s"expected a literal piece array, got $e")
    val arr = e.eval().asInstanceOf[ArrayData]
    require(arr != null, "piece array must be non-null")
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }
}
