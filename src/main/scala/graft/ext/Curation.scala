package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Corpus-curation operators for LLM training-data pipelines: PII scrubbing,
  * repetition/quality heuristics (Gopher-style rules), domain-mixture
  * weighting, linear quality-classifier inference and BM25 retrieval.
  *
  * Everything is pure Column expressions or a single reduced aggregation —
  * no UDFs, no driver-side loops — so the operators stay inside whole-stage
  * codegen and scale linearly with the corpus. Regexes are restricted to the
  * syntax subset Java regex and RE2 (DuckDB) share, which is what makes the
  * oracle twins possible.
  */
object Curation {

  // ---------------------------------------------------------------- PII ----

  /** PII patterns (category → regex). Deliberately RE2-compatible: character
    * classes, bounded repetition, non-capturing groups and ASCII `\b` only.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}",
    "ipv4" -> "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  )

  /** Occurrence count of one PII category in `c` (long). */
  def piiCount(c: Column, category: String): Column =
    regexp_count(c, lit(piiPatterns.toMap.apply(category))).cast("long")

  /** Redact every PII occurrence with `[CATEGORY]` placeholders. Email runs
    * first (its local part may contain digits/dots that the other patterns
    * could partially claim), then phone, then ipv4.
    */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (cat, re)) =>
      regexp_replace(acc, re, s"[${cat.toUpperCase}]")
    }

  /** k-ANONYMITY / l-DIVERSITY census over a quasi-identifier tuple: one
    * row per equivalence class (the distinct QI combination) with its
    * size, its count of distinct sensitive values, and the two release
    * gates — `k_anonymous` (size ≥ k: the class cannot single out fewer
    * than k individuals) and `l_diverse` (≥ l distinct sensitive values:
    * the class does not reveal the sensitive attribute even when joined).
    * The privacy audit a curation pipeline runs before releasing
    * aggregate or record-level exports; classes failing either gate are
    * the rows to suppress or generalize.
    *
    * Scale shape: one partial-aggregated groupBy on the QI tuple (counts
    * shuffle, rows do not) with a single exact count_distinct (one
    * distinct per agg — the q201 multi-distinct Expand trap does not
    * arise). Null QI values form their own class, matching SQL GROUP BY
    * in both engines.
    */
  def kAnonymityCensus(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Int,
      l: Int
  ): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col(sensitiveCol)).cast("long").as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
      .orderBy(qiCols.map(c => asc_nulls_first(c)): _*)
  }

  /** GENERALIZATION LADDER for k-anonymity: given an ordered sequence of
    * increasingly coarse quasi-identifier projections (the domain
    * generalization hierarchy — e.g. exact balance → balance/100 →
    * balance/1000 → dropped), audit every level in one query and mark the
    * FIRST level whose minimum equivalence-class size reaches `k` — the
    * release decision ([[kAnonymityCensus]] is the per-class drill-down
    * at whatever level this picks). Per level it reports the class count,
    * the minimum class size, and the suppression cost (rows living in
    * classes below `k` — what you'd have to drop to release at that
    * level WITHOUT generalizing further).
    *
    * Scale shape: one partial-aggregated groupBy per ladder level (each
    * shuffles only its class-key tuples + counts, never rows), reduced to
    * one row per level; the "first level that meets k" marking is a
    * broadcast of the 1-row minimum over the ≤|levels|-row result. Levels
    * are independent scans and pipeline in one job.
    */
  def anonymizationLadder(
      df: DataFrame,
      levels: Seq[(String, Seq[Column])],
      k: Int
  ): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    val perLevel = levels.zipWithIndex.map { case ((name, qi), idx) =>
      df.groupBy(qi: _*)
        .agg(count(lit(1)).cast("long").as("_sz"))
        .agg(
          count(lit(1)).cast("long").as("n_classes"),
          min(col("_sz")).cast("long").as("min_class_size"),
          coalesce(sum(when(col("_sz") < k, col("_sz"))), lit(0L))
            .cast("long").as("rows_below_k"))
        .select(lit(idx.toLong).as("level"), lit(name).as("level_name"),
          col("n_classes"), col("min_class_size"), col("rows_below_k"),
          (col("min_class_size") >= k).as("meets_k"))
    }
    val ladder = perLevel.reduce(_.unionByName(_))
    val first = broadcast(ladder.filter(col("meets_k"))
      .agg(coalesce(min(col("level")), lit(-1L)).as("_first")))
    ladder.crossJoin(first)
      .withColumn("chosen", col("level") === col("_first"))
      .drop("_first")
      .orderBy("level")
  }

  // ------------------------------------------- repetition (Gopher rules) ---

  /** Non-distinct word bigrams ("w1 w2" strings); empty/1-token texts give
    * an empty array. Unlike [[Dedup.wordNgrams]] this keeps duplicates —
    * repetition scoring is exactly about the duplicates.
    *
    * IMPORTANT: pass a MATERIALIZED token-array column (a plain attribute),
    * not an inline `tokens(text)` subtree — the lambda slices `toks` per
    * element, so an inline tokenization would be re-evaluated for every
    * bigram (O(n²) per document; the round-2 nested-HOF trap).
    */
  def bigramsFromTokens(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))

  /** Convenience form over raw text. O(tokens²) per row — the inline
    * tokenization re-runs inside the per-element slice — so this is for
    * ad-hoc/small inputs only; corpus paths project the tokens first.
    */
  def wordBigrams(c: Column): Column =
    bigramsFromTokens(TextAnalysis.tokens(c))

  /** Per-document repetition metrics (the Gopher/Falcon quality-rule family)
    * over `textCol`:
    *  - `n_words`, `n_distinct_words`, `mean_word_len`
    *  - `top_word_frac`: occurrences of the most frequent word / n_words
    *  - `dup_bigram_frac`: 1 − distinct bigrams / total bigrams
    *  - `keep`: the composite filter decision
    *
    * Scale shape: EVERY metric is computed SCAN-SIDE in TWO native
    * passes over the token array — [[graft.functions.TokenStats]] (one
    * hash-count loop → n_words/n_distinct/chars/top_cnt) and
    * [[graft.functions.WordGramHashes]] at n=2 (distinct-bigram count,
    * hash-family-independent) — so the operator has ZERO exchanges and
    * no interpreted HOFs. The explode→groupBy×2→join formulation this
    * replaces shuffled one row per TOKEN (100M rows at the 100× point)
    * for a statistic local to each document, and the composable
    * array-expression form materialized distinct-copy and bigram-string
    * arrays per row. All ratios are single exact-operand double
    * divisions, so the DuckDB twin reproduces them bit-exactly.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array ONCE per row (CollapseProject keeps
    // non-cheap aliases; inlining tokens() into each consumer made the
    // op O(tokens²) per doc)
    val withArrays = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
    val toks = col("_t")
    val scan = withArrays.select(
      col(idCol),
      call_function("token_stats", toks).as("_ts"),
      // wordNgrams n=2 semantics: < 2 tokens → no bigrams
      when(size(toks) < 2, lit(0L))
        .otherwise((size(toks) - 1).cast("long")).as("_n_bigrams"),
      when(size(toks) < 2, lit(0L))
        .otherwise(size(call_function("word_gram_hashes", toks, lit(2)))
          .cast("long")).as("_n_distinct_bigrams")
    ).select(
      col(idCol),
      col("_ts.n_words").as("n_words"),
      col("_ts.n_distinct").as("n_distinct_words"),
      col("_ts.chars").as("_chars"),
      col("_ts.top_cnt").as("_top_cnt"),
      col("_n_bigrams"), col("_n_distinct_bigrams")
    )
    val m = scan
      .withColumn("mean_word_len",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(round(col("_chars").cast("double") / col("n_words"), 6)))
      .withColumn("top_word_frac",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(round(
            coalesce(col("_top_cnt"), lit(0L)).cast("double") / col("n_words"), 6)))
      .withColumn("dup_bigram_frac",
        when(col("_n_bigrams") === 0, lit(0.0))
          .otherwise(round(
            lit(1.0) - col("_n_distinct_bigrams").cast("double") / col("_n_bigrams"), 6)))
    m.withColumn("keep",
        col("n_words") >= 5 && col("mean_word_len").between(2.0, 12.0) &&
          col("top_word_frac") <= 0.2 && col("dup_bigram_frac") <= 0.4)
      .select(col(idCol), col("n_words"), col("n_distinct_words"),
        col("mean_word_len"), col("top_word_frac"), col("dup_bigram_frac"),
        col("keep"))
  }

  // ----------------------------------------------------- domain mixture ---

  /** Temperature-weighted domain-mixture table: one row per `groupCol` value
    * with `weight ∝ count^0.5` normalized to 1 — the "α-sampling" step that
    * rebalances source domains before training (α = 0.5, i.e. sqrt, chosen
    * because IEEE sqrt is correctly rounded in every engine; ln/pow are not).
    *
    * The raw weights are rounded to 6 dp and summed as DECIMAL so the
    * normalizing total is exact and order-independent — groupBy reduces the
    * corpus to |domains| rows first, so the crossJoin is a broadcast of one
    * tiny aggregate row, never a corpus-sized shuffle.
    */
  def mixtureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val raw = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("_w",
        round(sqrt(col("n_docs").cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
    val total = broadcast(raw.agg(sum(col("_w")).as("_total")))
    raw
      .crossJoin(total)
      .withColumn("weight",
        round(col("_w").cast("double") / col("_total").cast("double"), 6))
      .select(col(groupCol), col("n_docs"), col("weight"))
  }

  /** Token-budget WATER-FILLING allocation across sources: find the level
    * θ with Σ_s min(n_s, θ) = B (the token budget) and give every source
    * min(n_s, θ) — small sources contribute everything they have,
    * large sources are capped at the common level. This is the budgeted
    * generalization of temperature mixing (mixtureWeights): the standard
    * way to fill a fixed training-token budget without letting one giant
    * domain drown the rest.
    *
    * The budget is the exact rational (total · num) DIV den, so both
    * engines derive it in integer arithmetic. θ comes from the classic
    * sorted sweep: with sources ascending by n and cum_i the prefix sum,
    * θ_i = (B − cum_i)/(m − i) for "first i sources fully taken"; the
    * valid i (θ_i ≥ n_i and θ_i ≤ n_{i+1}) is unique up to boundary ties,
    * and the smallest is chosen deterministically. All comparisons and
    * the one division are IEEE doubles with identical shape in DuckDB.
    *
    * Scale shape: the corpus contributes ONE token-count aggregate; the
    * sweep runs on the |sources|-row dimension table (the partitionless
    * windows only ever see that tiny table), and the final allocation is
    * a broadcast of the 1-row θ back onto it.
    */
  def tokenBudgetAllocation(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      budgetNum: Long = 1L,
      budgetDen: Long = 2L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).cast("long").as("n_tokens"))
    val tot = broadcast(counts.agg(
      sum(col("n_tokens")).cast("long").as("_t"),
      count(lit(1)).cast("long").as("_m"),
      min(col("n_tokens")).cast("long").as("_minn")))
    val wOrd = Window.orderBy(col("n_tokens"), col(groupCol))
    val ord = counts.crossJoin(tot)
      .withColumn("_b", expr(s"_t * $budgetNum DIV $budgetDen"))
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .withColumn("_cum", sum(col("n_tokens")).over(wOrd))
      .withColumn("_lead_n", lead(col("n_tokens"), 1).over(wOrd))
    // candidate i=0 (nothing saturated): θ = B/m, valid iff θ ≤ min n
    val zero = tot
      .withColumn("_b", expr(s"_t * $budgetNum DIV $budgetDen"))
      .select(lit(0L).as("_i"), lit(0L).as("_cum"),
        lit(null).cast("long").as("_n"), col("_minn").as("_lead_n"),
        col("_b"), col("_m"))
    val cands = ord
      .select(col("_i"), col("_cum"), col("n_tokens").as("_n"),
        col("_lead_n"), col("_b"), col("_m"))
      .unionByName(zero)
      .withColumn("_theta",
        (col("_b") - col("_cum")).cast("double")
          / (col("_m") - col("_i")).cast("double"))
      .filter((col("_n").isNull || col("_theta") >= col("_n").cast("double"))
        && (col("_lead_n").isNull
          || col("_theta") <= col("_lead_n").cast("double")))
      .orderBy("_i").limit(1)
    counts.crossJoin(broadcast(cands.select(col("_theta"), col("_b"))))
      .select(col(groupCol), col("n_tokens"), col("_b").as("budget"),
        round(least(col("n_tokens").cast("double"), col("_theta")), 4)
          .as("allocated"),
        (col("n_tokens").cast("double") <= col("_theta")).as("saturated"))
      .orderBy(groupCol)
  }

  // ------------------------------------------- quality classifier (LR) ----

  /** Deterministic text features for the linear quality model, each in [0,1].
    * All four are exact-arithmetic (integer counts + one double division), so
    * the classifier's input — and with rounding, its output — is
    * engine-portable.
    */
  def qualityFeatures(c: Column): Seq[Column] = {
    val nTok = TextAnalysis.tokenCount(c)
    val f1 = least(length(c).cast("double") / 500.0, lit(1.0))
    val f2 = TextAnalysis.alphaRatio(c)
    val f3 = least(TextAnalysis.stopwordRatio(c) * 5.0, lit(1.0))
    val meanTok =
      when(nTok === 0, lit(0.0))
        .otherwise(length(regexp_replace(c, "\\s+", "")).cast("double") / nTok)
    val f4 = least(meanTok / 10.0, lit(1.0))
    Seq(f1, f2, f3, f4)
  }

  /** Fixed weights/bias of the quality model — stand-ins for a trained
    * fastText/LR quality classifier; inference shape is identical.
    */
  val qualityWeights: Seq[Double] = Seq(0.8, 1.5, 2.0, -0.7)
  val qualityBias: Double = -1.2

  /** Logistic-regression inference: sigmoid(w·x + b), z rounded to 6 dp
    * before the exp so both engines exponentiate the identical argument.
    */
  def logisticScore(features: Seq[Column], weights: Seq[Double], bias: Double): Column = {
    require(features.length == weights.length, "feature/weight arity mismatch")
    val z = round(
      features.zip(weights).foldLeft(lit(bias): Column) {
        case (acc, (f, w)) => acc + f * lit(w)
      }, 6)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
  }

  // ------------------------------------------- corpus n-gram statistics ---

  /** Corpus-level top-k word n-grams (n=2): the "heavy hitters" statistic
    * used for boilerplate detection and contamination screens. Exact counts
    * via explode → two-phase hash aggregate (partial map-side combine means
    * only the distinct-gram table shuffles, never the corpus); the global
    * top-k then sorts the AGGREGATED gram table, which is ≤ |vocabulary|²
    * rows regardless of corpus size. For lakes where even that table is too
    * wide, cut it first with a `HAVING count > floor` predicate (`minCount`).
    */
  def topBigrams(
      df: DataFrame,
      textCol: String,
      k: Int = 20,
      minCount: Long = 1L
  ): DataFrame = {
    val grams = df
      .select(TextAnalysis.tokens(lower(col(textCol))).as("_t"))
      .select(explode(bigramsFromTokens(col("_t"))).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(desc("cnt"), col("ngram"))
      .limit(k)
    grams.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("cnt"), col("ngram"))).cast("long"))
  }

  // ------------------------------------------------ blocklist filtering ---

  /** Remove corpus rows whose `keyCol` appears in a blocklist (URL/content
    * fingerprint takedowns, opt-outs, known-bad sources). EXACT result with
    * a Bloom-filter fast path:
    *
    *  1. a Bloom filter over the blocklist keys is built with
    *     `bloom_filter_agg` and broadcast (one small binary blob);
    *  2. rows the filter rejects are DEFINITELY clean — they pass through
    *     scan-side, no join, no shuffle (at lake scale this is ~all rows);
    *  3. only Bloom-positive rows (true hits + the filter's false positives)
    *     reach the exact anti-join that removes the real hits.
    *
    * Exactness does not depend on the Bloom filter's error rate — false
    * positives just take the slow path — which is why q89 can oracle this
    * against a plain `NOT IN` DuckDB twin.
    */
  def blocklistFilter(
      corpus: DataFrame,
      blocklist: DataFrame,
      keyCol: String,
      expectedItems: Long = 1000000L
  ): DataFrame = {
    val spark = corpus.sparkSession
    val keys = blocklist.select(col(keyCol)).distinct()
    // BloomFilterMightContain requires its bloom arg to be a constant or a
    // scalar subquery — the same shape Spark's own InjectRuntimeFilter
    // emits: the one-row bloom aggregate runs once and feeds the corpus-side
    // filter with NO join. The subquery is only expressible in SQL text, so
    // the two sides go through short-lived temp views (dropped right after
    // analysis; the resolved plans keep their relations). coalesce(_, false)
    // covers the empty-blocklist bloom (NULL → nothing may match).
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val cv = s"graft_blf_corpus_$tag"
    val kv = s"graft_blf_keys_$tag"
    corpus.createOrReplaceTempView(cv)
    keys.createOrReplaceTempView(kv)
    try {
      val probe =
        s"""coalesce(bloom_might_contain(
           |  (SELECT bloom_filter_agg(xxhash64($keyCol), ${expectedItems}L,
           |          ${expectedItems * 8}L) FROM $kv),
           |  xxhash64($keyCol)), false)""".stripMargin
      val clean = spark.sql(s"SELECT * FROM $cv WHERE NOT $probe")
      val candidates = spark.sql(s"SELECT * FROM $cv WHERE $probe")
        .join(broadcast(keys), Seq(keyCol), "left_anti")
      clean.unionByName(candidates)
    } finally {
      spark.catalog.dropTempView(cv)
      spark.catalog.dropTempView(kv)
      ()
    }
  }

  // ----------------------------------------------------------- BM25 -------

  /** BM25 top-k retrieval of `terms` over the corpus (Okapi BM25, k1/b as
    * published). The per-(doc,term) partial scores are rounded to 6 dp and
    * summed as DECIMAL so the per-document total is order-independent —
    * double `sum()` would depend on partitioning.
    *
    * Scale shape: term frequencies are SCAN-SIDE (`size(filter(tokens))` per
    * query term — the corpus is never exploded into its full token stream);
    * only docs matching ≥1 query term reach the aggregation, and N/avgdl/df
    * ride the plan as broadcast one-row aggregates.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    // tokens materialized once; the per-term tf filters then scan the array
    // attribute instead of re-tokenizing the text per query term
    val base = df
      .select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("_t"))
      .select(
        col(idCol),
        size(col("_t")).cast("long").as("_dl"),
        array(terms.map(t =>
          size(filter(col("_t"), x => x === lit(t))).cast("long")): _*).as("_tfs"))
    // melt to (id, dl, term, tf>0) rows — one row per matched (doc, term)
    val pairs = base
      .select(col(idCol), col("_dl"),
        posexplode(col("_tfs")).as(Seq("_ti", "tf")))
      .filter(col("tf") > 0)
      .withColumn("term",
        element_at(typedLit(terms), col("_ti").cast("int") + 1))
    val stats = broadcast(base.agg(
      count(lit(1)).cast("long").as("_n"),
      (sum(col("_dl")).cast("double") / count(lit(1))).as("_avgdl")))
    val docFreq = pairs.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("_df"))
    val partial = pairs
      .join(broadcast(docFreq), "term")
      .crossJoin(stats)
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_ts", round(
        col("_idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("_dl") / col("_avgdl"))),
        6).cast(org.apache.spark.sql.types.DecimalType(20, 6)))
    val scored = partial
      .groupBy(col(idCol))
      .agg(
        round(sum(col("_ts")).cast("double"), 4).as("bm25"),
        count(lit(1)).cast("long").as("n_terms_hit"))
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("bm25"), col(idCol))).cast("long"))
  }

  /** Declarative data-quality audit: evaluate a rule set (name → violation
    * predicate) in ONE aggregate pass over the table and return a row per
    * rule with violation count and percentage. A null predicate result
    * counts as non-violating (SQL FILTER semantics) — write rules so null
    * means "cannot judge".
    *
    * Scale design: every rule is a conditional count inside a single
    * partial-aggregating scan — adding rules adds registers, not passes;
    * the per-rule rows are exploded from the one aggregate row. At 100 TB
    * an audit of 50 rules costs exactly one column-pruned scan.
    */
  def qualityRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "qualityRules needs at least one rule")
    val aggs = count(lit(1)).cast("long").as("_n") +:
      rules.map { case (name, pred) =>
        count(when(pred, 1)).cast("long").as(s"_v_$name")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val pairs = array(rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"_v_$name").as("n_violations"))
    }: _*)
    row.select(explode(pairs).as("r"), col("_n"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        col("_n").as("n_rows"),
        round(col("r.n_violations").cast("double") / col("_n")
          * lit(100.0).cast("double"), 6).as("violation_pct"))
  }

  /** Collocation mining by LIFT: bigrams whose observed rate beats the
    * unigram-independence expectation,
    * lift = (B_xy/B) / ((U_x/T)·(U_y/T)), evaluated as the fixed IEEE
    * sequence ((((B_xy·T)/B)·T)/U_x)/U_y on exact integer counts — same
    * ranking as PMI but with NO log, so no libm parity risk in the oracle.
    *
    * Scale design: two aggregation passes over the token projection
    * (unigram and bigram counts — re-scan beats shuffling gram arrays,
    * the minhash house rule), then only the minCount-surviving bigrams
    * (small) join the vocab table; totals ride a broadcast. The corpus
    * text itself never shuffles.
    */
  def collocationsByLift(
      df: DataFrame,
      textCol: String,
      k: Int = 20,
      minPairCount: Long = 20L
  ): DataFrame = {
    val toks = df.select(TextAnalysis.tokens(lower(col(textCol))).as("_t"))
    val uni = toks.select(explode(col("_t")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("uc"))
    val totals = broadcast(toks.agg(
      sum(size(col("_t")).cast("long")).cast("long").as("t_tokens"),
      sum(when(size(col("_t")) >= 2, size(col("_t")) - 1).otherwise(0)
        .cast("long")).cast("long").as("b_pairs")))
    val bi = toks
      .select(explode(bigramsFromTokens(col("_t"))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).cast("long").as("pair_count"))
      .filter(col("pair_count") >= minPairCount)
    val lift = ((((col("pair_count").cast("double") * col("t_tokens"))
      / col("b_pairs")) * col("t_tokens")) / col("u1")) / col("u2")
    bi
      .withColumn("w1", split(col("ngram"), " ").getItem(0))
      .withColumn("w2", split(col("ngram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("uc").as("u1")), "w1")
      .join(uni.select(col("w").as("w2"), col("uc").as("u2")), "w2")
      .crossJoin(totals)
      .select(col("ngram"), col("pair_count"), round(lift, 6).as("lift"))
      .orderBy(desc("lift"), col("ngram"))
      .limit(k)
  }

  // ------------------------------------------- boilerplate segment removal ----

  /** C4-style cross-document boilerplate removal at SEGMENT grain: any
    * segment whose exact text occurs in ≥ `minDocFreq` DISTINCT documents
    * (nav bars, cookie banners, licence footers in a real crawl) is dropped
    * from every document; the survivors are re-joined in original order.
    * Segments here are non-overlapping `segTokens`-word chunks — the
    * corpus fixtures carry no newlines, and on a real crawl the same plan
    * runs with `split(text, "\n")` as the segment source (ref corpus
    * cleaning: clean_traffic.py drops repeated rows the same
    * count-then-filter way, at row grain).
    *
    * Scale shape: the document-frequency aggregate shuffles only the 8-byte
    * xxhash64 of each segment (never segment text — the q79 argument: a
    * count over hash groups equals the count over string groups up to
    * ~1e-15 collision odds, which is also why the string-keyed DuckDB twin
    * hash-matches). The resulting boilerplate set is small by construction
    * (only segments repeated across documents) and broadcasts; the one
    * unavoidable text shuffle is the per-document rebuild (doc-key grouped,
    * linear). Output: (idCol, clean_text, n_segments, n_removed) — one row
    * per input document, clean_text = "" when everything was boilerplate.
    */
  def removeBoilerplateSegments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int = 10,
      minDocFreq: Long = 2L
  ): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    val segs = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .withColumn("_nc",
        greatest(lit(1L), expr(s"(size(_t) + $segTokens - 1) div $segTokens")))
      .withColumn("seg_id", explode(sequence(lit(0L), col("_nc") - 1)))
      .select(col(idCol), col("seg_id"),
        array_join(
          slice(col("_t"), (col("seg_id") * segTokens + 1).cast("int"),
            lit(segTokens)), " ").as("seg"))
      .withColumn("_h", xxhash64(col("seg")))
    val boiler = segs
      .groupBy("_h")
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocFreq)
      .select(col("_h"), lit(true).as("_boiler"))
    val kept = segs
      .join(broadcast(boiler), Seq("_h"), "left")
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_boiler").isNull, struct(col("seg_id"), col("seg"))))),
            s => s.getField("seg")), " ").as("clean_text"),
        count(lit(1)).cast("long").as("n_segments"),
        count(when(col("_boiler"), 1)).cast("long").as("n_removed"))
    kept
  }

  /** Per-source dataset DATASHEET — the one-table corpus card a curation
    * run publishes: volume (docs, tokens, exact median tokens), exact-dup
    * load (docs sharing a content hash within the source), and language
    * mix (distinct langs, deterministic top lang + its share). One scan
    * for the volume stats, one hash-only aggregation for dups, one
    * (source, lang) aggregation for the mix — nothing wider than hashes
    * and counts shuffles. Fully DuckDB-oracled (q191).
    */
  def datasheet(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = col(sourceCol).as("source")
    val tok = TextAnalysis.tokenCount(col(textCol))
    val base = docs.groupBy(src)
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(tok).cast("long").as("total_tokens"),
        round(percentile(tok, lit(0.5)), 1).as("median_tokens"))
    val dups = docs
      .select(src, Dedup.contentHash(Seq(textCol)).as("_h"))
      .groupBy("source", "_h").agg(count(lit(1)).as("_n"))
      .groupBy("source")
      .agg(sum(when(col("_n") > 1, col("_n")).otherwise(lit(0L)))
        .cast("long").as("dup_docs"))
    val langs = docs.groupBy(src, col(langCol).as("_lang"))
      .agg(count(lit(1)).as("_ln"))
      .localCheckpoint(true) // consumed twice: n_langs + top pick
    val nLangs = langs.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_langs"))
    val top = langs
      .withColumn("_rn", row_number().over(
        Window.partitionBy("source").orderBy(desc("_ln"), asc("_lang"))))
      .filter(col("_rn") === 1)
      .select(col("source"), col("_lang").as("top_lang"),
        col("_ln").as("_topn"))
    base.join(dups, Seq("source")).join(nLangs, Seq("source"))
      .join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("median_tokens"), col("dup_docs"), col("n_langs"),
        col("top_lang"),
        round(lit(100.0) * col("_topn").cast("double") /
          col("n_docs").cast("double"), 2).as("top_lang_pct"))
      .orderBy("source")
  }

  /** LENGTH-BUCKETED BATCHING plan: assign every doc to the smallest
    * power-of-two token-length bucket (16…256), and report per bucket the
    * padding waste and batch count a fixed `batchTokens` budget yields —
    * plus the `~global` row (pad everything to the corpus max), whose
    * waste is what bucketing saves. The pre-tokenization readout a
    * training-data pipeline gates batch geometry on; all integer math
    * (⌈·⌉ via (a+b−1) div b), one narrow aggregation over token counts.
    */
  /** URL canonicalization — the standard web-corpus dedup key: two
    * spellings of one resource must collapse before any exact/near dedup
    * sees them. Rules (the widely-used conservative set):
    *
    *  - scheme and host lowercased; a leading `www.` stripped
    *  - the scheme-DEFAULT port dropped (https:443 / http:80); any other
    *    explicit port kept
    *  - fragment removed
    *  - path dot-segments resolved (`/./` skipped, `/x/../` popped) via
    *    a left fold with a STRING accumulator (the canonical path so
    *    far) — expressible identically as Spark `aggregate` and DuckDB
    *    `list_reduce`; empty path → "/"
    *  - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`),
    *    remaining query parameters sorted bytewise
    *
    * Entirely composed Spark functions (codegen'd, no UDF); every HOF
    * input is a MATERIALIZED projection column (the q84 rule). Adds
    * `outCol` plus `_host`/`_path`/`_n_params` diagnostics; internal
    * columns dropped.
    */
  def canonicalizeUrls(df: DataFrame, urlCol: String,
      outCol: String = "canonical_url"): DataFrame = {
    val d1 = df
      .withColumn("_nf", regexp_replace(col(urlCol), "#.*", ""))
    val d2 = d1
      .withColumn("_scheme",
        lower(regexp_extract(col("_nf"), "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1)))
      .withColumn("_rest",
        regexp_replace(col("_nf"), "^[A-Za-z][A-Za-z0-9+.\\-]*://", ""))
    val d3 = d2
      .withColumn("_hostport", regexp_extract(col("_rest"), "^([^/?]*)", 1))
      .withColumn("_after", regexp_replace(col("_rest"), "^[^/?]*", ""))
    val d4 = d3
      .withColumn("_host",
        regexp_replace(lower(regexp_extract(col("_hostport"), "^([^:]*)", 1)),
          "^www\\.", ""))
      .withColumn("_port", regexp_extract(col("_hostport"), ":([0-9]+)$", 1))
      .withColumn("_pathraw", regexp_extract(col("_after"), "^([^?]*)", 1))
      .withColumn("_queryraw",
        when(col("_after").contains("?"),
          regexp_replace(col("_after"), "^[^?]*\\?", ""))
          .otherwise(lit("")))
    val d5 = d4
      .withColumn("_segs", split(col("_pathraw"), "/"))
      .withColumn("_params0", split(col("_queryraw"), "&"))
    val d6 = d5
      .withColumn("_path0",
        aggregate(col("_segs"), lit(""), (acc, x) =>
          when(x === "" || x === ".", acc)
            .when(x === "..", regexp_replace(acc, "/[^/]*$", ""))
            .otherwise(concat(acc, lit("/"), x))))
      .withColumn("_paramlist",
        array_sort(filter(col("_params0"), x =>
          x =!= "" && !x.startsWith("utm_") &&
            !x.startsWith("fbclid=") && !x.startsWith("gclid="))))
    val keepPort = col("_port") =!= "" &&
      !(col("_scheme") === "https" && col("_port") === "443") &&
      !(col("_scheme") === "http" && col("_port") === "80")
    d6
      .withColumn("_path",
        when(col("_path0") === "", lit("/")).otherwise(col("_path0")))
      .withColumn("_n_params", size(col("_paramlist")).cast("long"))
      .withColumn("_params", array_join(col("_paramlist"), "&"))
      .withColumn(outCol, concat(
        col("_scheme"), lit("://"), col("_host"),
        when(keepPort, concat(lit(":"), col("_port"))).otherwise(lit("")),
        when(col("_path0") === "", lit("/")).otherwise(col("_path0")),
        when(col("_params") =!= "", concat(lit("?"), col("_params")))
          .otherwise(lit(""))))
      .drop("_nf", "_rest", "_hostport", "_after", "_pathraw", "_queryraw",
        "_segs", "_params0", "_path0", "_paramlist", "_params", "_port",
        "_scheme")
  }

  /** HTML → text extraction (the WET step of web curation): drop
    * script/style blocks and comments WHOLE (their content is not text —
    * and a `1 < 2` inside a script would otherwise shred the naive
    * tag regex), strip remaining tags, decode the common entities
    * (`&amp;` LAST — the classic double-decode pitfall), collapse
    * whitespace. One chain of codegen'd regexp/replace calls, no UDF.
    * Anchored-free patterns are safe cross-engine because the DuckDB
    * twin passes the 'g' flag (Spark's regexp_replace is always
    * replace-all); `(?is)` + lazy `.*?` parse identically in Java
    * regex and RE2.
    */
  def htmlToText(c: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (ent, ch)) =>
        replace(col0, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def lengthBucketBatching(
      docs: DataFrame,
      textCol: String,
      batchTokens: Int = 4096
  ): DataFrame = {
    val toks = docs.select(TextAnalysis.tokenCount(col(textCol)).as("_n"))
      .localCheckpoint(true) // consumed by the per-bucket AND ~global branch
    // a doc longer than the top bucket CHUNKS into ⌈n/bucket⌉ segments
    // (segs = 1 for every in-range doc), so padding waste stays ≥ 0 and
    // batch counts reflect the real sequence rows the loader emits
    val per = toks
      .withColumn("_b",
        when(col("_n") <= 16, 16L).when(col("_n") <= 32, 32L)
          .when(col("_n") <= 64, 64L).when(col("_n") <= 128, 128L)
          .otherwise(256L))
      .withColumn("_segs", expr("(_n + _b - 1) div _b"))
      .groupBy("_b")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("_n")).cast("long").as("sum_tokens"),
        sum(col("_segs")).cast("long").as("_nsegs"))
      .select(concat(lit("b"), lpad(col("_b").cast("string"), 3, "0"))
          .as("bucket_label"),
        col("_b").as("bucket"), col("n_docs"), col("sum_tokens"),
        col("_nsegs"))
    val glob = toks.agg(max(col("_n")).cast("long").as("bucket"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("_n")).cast("long").as("sum_tokens"))
      .select(lit("~global").as("bucket_label"), col("bucket"),
        col("n_docs"), col("sum_tokens"),
        col("n_docs").as("_nsegs")) // pad-to-max: one segment per doc
    per.unionByName(glob)
      .withColumn("padded_tokens", col("_nsegs") * col("bucket"))
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))
      .select(col("bucket_label"), col("bucket"), col("n_docs"),
        col("sum_tokens"), col("padded_tokens"), col("waste_tokens"),
        round(lit(100.0) * col("waste_tokens").cast("double") /
          col("padded_tokens").cast("double"), 4).as("waste_pct"),
        // rows/batch floored at 1: a sequence longer than the budget
        // still ships as a singleton batch (and guards div-by-zero)
        expr(s"(_nsegs + greatest(1L, $batchTokens div bucket) - 1) div " +
          s"greatest(1L, $batchTokens div bucket)").cast("long")
          .as("n_batches"))
      .orderBy("bucket_label")
  }
}
