package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed semantics for the curation operators (oracle value parity
  * at corpus scale is covered by q83–q87 / check_oracle.py).
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("piiCount + redactPii: counts and placeholders on a crafted string") {
    val s = "mail a.b+c@x-mail.co.uk or bob@ex.io, call +1-555-0099, " +
      "host 192.168.0.1 end"
    val df = Seq(s).toDF("t").select(
      Curation.piiCount(col("t"), "email").as("e"),
      Curation.piiCount(col("t"), "phone").as("p"),
      Curation.piiCount(col("t"), "ipv4").as("i"),
      Curation.redactPii(col("t")).as("r"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 2)
    assert(r.getLong(1) == 1)
    assert(r.getLong(2) == 1)
    assert(r.getString(3) ==
      "mail [EMAIL] or [EMAIL], call [PHONE], host [IPV4] end")
  }

  test("piiCount: clean text counts zero in every category") {
    val df = Seq("no pii here at all").toDF("t")
    val r = df.select(
      Curation.piiCount(col("t"), "email") +
        Curation.piiCount(col("t"), "phone") +
        Curation.piiCount(col("t"), "ipv4")).collect()(0)
    assert(r.getLong(0) == 0)
  }

  test("wordBigrams: ordered, duplicate-preserving; degenerate inputs empty") {
    val bg = Seq("a b a b", "solo", "", "  ").toDF("t")
      .select(Curation.wordBigrams(col("t")).as("bg"))
      .collect().map(_.getSeq[String](0))
    assert(bg(0) == Seq("a b", "b a", "a b"))
    assert(bg(1).isEmpty && bg(2).isEmpty && bg(3).isEmpty)
  }

  test("repetitionMetrics: hand-computed fractions and the keep rule") {
    val docs = Seq(
      (1L, "spam spam spam spam ham"),            // top_word 4/5, dup bigram
      (2L, "the quick brown fox jumps over dog"), // clean 7-word prose
      (3L, "hi")                                  // too short
    ).toDF("doc_id", "text")
    val m = Curation.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 5 words, 2 distinct, top 4/5, bigrams: 4 total 2 distinct
    assert(m(0).getLong(1) == 5 && m(0).getLong(2) == 2)
    assert(m(0).getDouble(4) == 0.8)
    assert(m(0).getDouble(5) == 0.5)
    assert(!m(0).getBoolean(6)) // repetitive → filtered
    // doc 2: 7 distinct words, no repetition → kept
    assert(m(1).getLong(1) == 7 && m(1).getLong(2) == 7)
    assert(m(1).getDouble(4) == math.rint(1.0 / 7.0 * 1e6) / 1e6)
    assert(m(1).getBoolean(6))
    // doc 3: below the 5-word floor → filtered
    assert(!m(2).getBoolean(6))
  }

  test("mixtureWeights: sqrt-temperature weights, normalized, count-derived") {
    val df = (Seq.fill(9)("a") ++ Seq.fill(4)("b") ++ Seq("c")).toDF("src")
    val w = Curation.mixtureWeights(df, "src").orderBy("src").collect()
    // raw weights 3, 2, 1 → normalized 0.5, 1/3, 1/6
    assert(w.map(_.getLong(1)).toSeq == Seq(9L, 4L, 1L))
    assert(w(0).getDouble(2) == 0.5)
    assert(w(1).getDouble(2) == 0.333333)
    assert(w(2).getDouble(2) == 0.166667)
    assert(math.abs(w.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("logisticScore: sigmoid of the weighted features, rounded") {
    // single feature, weight 1, bias 0 → sigmoid(f)
    val df = Seq(0.0, 1.0).toDF("f")
    val s = df.select(
      Curation.logisticScore(Seq(col("f")), Seq(1.0), 0.0).as("s"))
      .collect().map(_.getDouble(0))
    assert(s(0) == 0.5)
    assert(s(1) == math.rint(1.0 / (1.0 + math.exp(-1.0)) * 1e4) / 1e4)
  }

  test("bm25TopK: rarer term outranks common term at equal tf") {
    val docs = Seq(
      (1L, "alpha beta beta beta"),   // common term only
      (2L, "gamma beta beta beta"),   // rare + common
      (3L, "beta beta beta beta"),
      (4L, "beta delta delta delta")
    ).toDF("doc_id", "text")
    val top = Curation.bm25TopK(docs, "doc_id", "text",
      terms = Seq("alpha", "gamma", "beta"), k = 4)
    val rows = top.collect()
    // doc 2 and doc 1 both have one rare term + 3×beta; gamma and alpha have
    // identical df → identical score; tie broken by doc_id
    assert(rows.map(_.getLong(0)).take(2).toSeq == Seq(1L, 2L))
    assert(rows(0).getDouble(1) == rows(1).getDouble(1))
    // every returned doc matched at least one term; ranks are 1..n
    assert(rows.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
  }

  test("bm25TopK: no query term in corpus → empty result") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(Curation.bm25TopK(docs, "doc_id", "text", Seq("missing")).isEmpty)
  }

  test("mixtureWeights plan: normalizing total is broadcast, not shuffled") {
    val df = Seq.fill(8)("a").toDF("src")
    val plan = Curation.mixtureWeights(df, "src")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("topBigrams: exact corpus counts, deterministic rank order") {
    val docs = Seq("a b a b", "a b c", "c a b").toDF("text")
    // "a b" appears 2+1+1 = 4 times; "b a" 1; "b c" 1; "c a" 1
    val top = Curation.topBigrams(docs, "text", k = 3).collect()
    assert(top(0).getString(0) == "a b" && top(0).getLong(1) == 4)
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    // ties broken alphabetically: "b a" < "b c" < "c a"
    assert(top(1).getString(0) == "b a" && top(2).getString(0) == "b c")
  }

  test("topBigrams: lowercases and honors minCount") {
    val docs = Seq("X y x Y", "x y").toDF("text")
    val top = Curation.topBigrams(docs, "text", k = 10, minCount = 2L)
    val rows = top.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x y", 3L)))
  }

  test("blocklistFilter: exact survivors regardless of bloom false positives") {
    val corpus = (1L to 200L).map(i => (i, s"k$i")).toDF("id", "key")
    val block = Seq("k3", "k50", "k199", "k999").toDF("key")
    // tiny bloom (high FP rate) to force candidates through the anti-join
    val out = Curation.blocklistFilter(corpus, block, "key",
      expectedItems = 2L)
    assert(out.count() == 197)
    assert(out.filter(col("key").isin("k3", "k50", "k199")).isEmpty)
    // untouched schema and values
    assert(out.columns.toSeq == Seq("id", "key"))
  }

  test("blocklistFilter: empty blocklist keeps everything") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("id", "key")
    val block = corpus.filter(lit(false)).select(col("key"))
    assert(Curation.blocklistFilter(corpus, block, "key").count() == 2)
  }

  test("blocklistFilter plan: bloom probe is scan-side, blocklist broadcast") {
    val corpus = (1L to 100L).map(i => (i, s"k$i")).toDF("id", "key")
    val block = Seq("k1").toDF("key")
    val plan = Curation.blocklistFilter(corpus, block, "key")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    assert(plan.contains("Subquery") || plan.contains("subquery"))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("removeBoilerplateSegments drops repeated segments, keeps order") {
    // 2-token segments; "x y" appears in docs 1 and 2 → boilerplate
    val docs = Seq(
      (1L, "x y a b"),
      (2L, "c d x y"),
      (3L, "e f g h")
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateSegments(docs, "doc_id", "text",
        segTokens = 2, minDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(
      (1L, "a b"), (2L, "c d"), (3L, "e f g h")))
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq == Seq(
      (2L, 1L), (2L, 1L), (2L, 0L)))
  }

  test("removeBoilerplateSegments: fully-boilerplate doc survives as empty") {
    val docs = Seq(
      (1L, "x y"),
      (2L, "x y"),
      (3L, "a b x y")
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateSegments(docs, "doc_id", "text",
        segTokens = 2, minDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "" && out(1).getString(1) == "")
    assert(out(2).getString(1) == "a b")
  }

  test("removeBoilerplateSegments: within-doc repeats are not boilerplate") {
    // "x y" repeats INSIDE doc 1 only — distinct-doc frequency is 1
    val docs = Seq(
      (1L, "x y x y"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateSegments(docs, "doc_id", "text",
        segTokens = 2, minDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "x y x y")
  }

  test("removeBoilerplateSegments: boilerplate set never carries doc text " +
    "through the doc-frequency shuffle") {
    val docs = Seq((1L, "x y a b"), (2L, "c d x y")).toDF("doc_id", "text")
    val plan = Curation.removeBoilerplateSegments(docs, "doc_id", "text",
      segTokens = 2, minDocFreq = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "boilerplate set must broadcast")
  }

  test("repetitionMetrics on empty and whitespace-only docs") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val m = Curation.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    m.foreach { r =>
      assert(r.getLong(1) == 0)
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0 &&
        r.getDouble(5) == 0.0)
      assert(!r.getBoolean(6))
    }
  }

  test("bigramLmScores: hand-computed absolute-discount probabilities; " +
    "sub-2-token docs omitted") {
    import spark.implicits._
    // bigrams come from doc 1 "a a b" only, but the unigram stream is the
    // WHOLE corpus (the 1-token doc "x" still contributes): c(a,a)=1
    // c(a,b)=1, ctx(a)=(c1=2, n1p=2), uni a=2 b=1 x=1, T=4 →
    //   p(a|a) = ((1-.5) + .5*2*(2/4)) / 2 = 0.5
    //   p(b|a) = ((1-.5) + .5*2*(1/4)) / 2 = 0.375
    val docs = Seq((1L, "a a b"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScores(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "min_p", "avg_p", "n_low")
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(out.length == 1, "1-token doc has no bigrams to score")
    val (id, n, minP, avgP, nLow) = out.head
    assert(id == 1L && n == 2L && nLow == 0L)
    assert(minP == 0.375)
    assert(avgP == 0.4375)
  }

  test("tokenBudgetAllocation: water level fills exactly B; small sources " +
    "saturate, big ones cap at theta") {
    import spark.implicits._
    // n = (a:2, b:4, c:10), total 16, B = 8 → sweep: i=1 gives
    // θ = (8−2)/2 = 3 (≥ n₁=2, ≤ n₂=4) → a keeps 2, b and c cap at 3
    val docs = Seq(
      ("a", "x y"), ("b", "x x x x"),
      ("c", "x x x x x x x x x x")
    ).toDF("source", "text")
    val out = Curation.tokenBudgetAllocation(docs, "source", "text")
      .select("source", "n_tokens", "budget", "allocated", "saturated")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 8L, 2.0, true),
      ("b", 4L, 8L, 3.0, false),
      ("c", 10L, 8L, 3.0, false)))
    // full budget (num=den=1): everything saturates at alloc = n
    val full = Curation.tokenBudgetAllocation(docs, "source", "text", 1L, 1L)
      .select("allocated", "saturated").as[(Double, Boolean)].collect()
    assert(full.forall(_._2) && full.map(_._1).sorted.toSeq == Seq(2.0, 4.0, 10.0))
  }

  test("datasheet: volume, dup load, and language mix per source") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "one two three", "en"), // 3 tokens
      ("s1", "one two three", "en"), // exact dup of the first
      ("s1", "uno dos", "es"), // 2 tokens
      ("s2", "a b c d", "en") // 4 tokens
    ).toDF("source", "text", "lang")
    val r = Curation.datasheet(docs, "source", "text", "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    assert(s1.getLong(1) == 3L && s1.getLong(2) == 8L) // docs, tokens
    assert(s1.getDouble(3) == 3.0) // median of (3,3,2)
    assert(s1.getLong(4) == 2L, "both copies count as dup load")
    assert(s1.getLong(5) == 2L && s1.getString(6) == "en")
    assert(s1.getDouble(7) == math.rint(200.0 / 3.0 * 100) / 100 ||
      s1.getDouble(7) == 66.67)
    val s2 = r("s2")
    assert(s2.getLong(1) == 1L && s2.getLong(4) == 0L &&
      s2.getDouble(7) == 100.0)
  }
}
