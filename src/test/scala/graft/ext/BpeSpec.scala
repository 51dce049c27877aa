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

  test("encodeVocab stays ONE PROJECTION PER MERGE after optimization " +
    "(the 49s nested-HOF regression pin)") {
    // folding k merges into one expression makes each aggregate HOF's
    // inline array input re-run the whole chain below per SYMBOL —
    // measured 49.3 s vs 0.64 s at 8 merges over the sf0.1 vocabulary.
    // If CollapseProject ever starts inlining these aliases, some
    // Project node will carry 2+ nested ArrayAggregates and this fails.
    // NOT a LocalRelation: ConvertToLocalRelation would fold the whole
    // plan into literal rows and leave nothing to inspect (r5 lesson)
    val words = spark.range(50)
      .select(concat(lit("word"), col("id")).as("w"))
    val merges = Seq("wo", "or", "rd", "wd")
      .zipWithIndex.map { case (p, i) =>
        Bpe.Merge(i + 1, p.take(1), p.drop(1), 0L)
      }
    val plan = Bpe.encodeVocab(words, "w", merges)
      .queryExecution.optimizedPlan
    def countAgg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.collect {
        case _: org.apache.spark.sql.catalyst.expressions.ArrayAggregate => 1
      }.sum
    val perProject = plan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map(countAgg).sum
    }
    assert(perProject.sum >= merges.size,
      s"expected >= ${merges.size} fold HOFs in the plan: $perProject")
    assert(perProject.forall(_ <= 1),
      s"a Project carries nested merge folds (re-collapsed!): $perProject")
  }

  // ---- GPT-2 byte-level lineage (r11) --------------------------------

  test("byte-encoder table matches the published GPT-2 mapping") {
    val enc = graft.functions.Gpt2ByteSym.ByteEncoder
    assert(enc(' ') == 'Ġ') // space -> Ġ, the hallmark
    assert(enc('\n') == 'Ċ') // newline -> Ċ
    assert(enc('!') == '!' && enc('~') == '~') // printable ascii fixed
    assert(enc(0) == 'Ā') // NUL is the first shifted byte
    assert(enc(0xad) == 'Ń') // soft hyphen is the last (256+67)
    // bijective: 256 distinct images, decoder inverts
    assert(enc.distinct.length == 256)
    assert((0 until 256).forall(b =>
      graft.functions.Gpt2ByteSym.ByteDecoder(enc(b)) == b))
    // separator stays outside the image
    assert(!enc.contains(graft.functions.Gpt2ByteSym.Sep))
  }

  test("gpt2 pretokenizer: contractions, spaces, lookahead split") {
    val df = spark.range(1).select(
      Bpe.gpt2Pretokenize(org.apache.spark.sql.functions
        .lit("I've  got 2 cats, don't I?")).as("t"))
    val got = df.collect()(0).getSeq[String](0)
    // the published regex: "'ve" splits off, " ?\p{L}+" keeps ONE
    // leading space, the double space splits as lone-space + " got"
    // (the lookahead branch), punctuation binds its leading space
    assert(got == Seq("I", "'ve", " ", " got", " 2", " cats", ",",
      " don", "'t", " I", "?"), got.mkString("[", "][", "]"))
    // concatenation restores the input exactly (regex covers all bytes)
    assert(got.mkString == "I've  got 2 cats, don't I?")
  }

  test("byte symbolize: ascii, space and multi-byte UTF-8") {
    val sep = graft.functions.Gpt2ByteSym.Sep
    assert(graft.functions.Gpt2ByteSym.symbolize(" the") ==
      Seq("Ġ", "t", "h", "e").mkString(sep.toString))
    // 'é' is two UTF-8 bytes (0xc3 0xa9): 0xc3 -> Ã (self), 0xa9 -> ©
    assert(graft.functions.Gpt2ByteSym.symbolize("é") ==
      s"Ã$sep©")
  }

  test("byte-level encode folds merges over byte symbols in rank order") {
    import spark.implicits._
    val g = "Ġ"
    val merges = Seq((g, "t"), ("h", "e"), (g + "t", "he"))
      .zipWithIndex.map { case ((a, b), i) => Bpe.Merge(i + 1, a, b, 0L) }
    val out = Bpe.encodeVocabBytes(
        Seq(" the", "the", " tot").toDF("pt"), "pt", merges)
      .select("pt", "sym", "n_pieces").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val s = graft.functions.Gpt2ByteSym.Sep
    // " the": Ġ|t|h|e -> Ġt|h|e -> Ġt|he -> Ġthe (rank-dependent)
    assert(out(" the") == ((s"${g}the", 1L)))
    // "the" (no leading space): t|h|e -> t|he — "Ġt" merges don't apply
    assert(out("the") == ((s"t${s}he", 2L)))
    // " tot": Ġ|t|o|t -> Ġt|o|t — only the first merge fires
    assert(out(" tot") == ((s"${g}t${s}o${s}t", 3L)))
  }
}
