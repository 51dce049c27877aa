package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches for lake-scale distinct counting and membership
  * pre-filtering.
  *
  * Both operators are built on [[Dedup.portableHash60]] (md5-derived 60-bit),
  * so every number they produce — including the *estimates* — has an exact
  * DuckDB twin: a KMV estimate is a deterministic function of the hash
  * values, not of engine randomness. The production swap-in is xxhash64
  * (same code path, faster hash, no cross-engine twin) — the q25/q69
  * precedent.
  *
  * Scale shape:
  *  - KMV: the only state per shard is its k smallest distinct hashes
  *    (k·8 bytes). Selection is two-level (salted windows), so no single
  *    reducer ever absorbs a shard's full distinct stream; sketches merge
  *    by unioning the k-sets and re-taking the bottom k — the union of
  *    per-shard bottom-k supersets the global bottom-k, which is the KMV
  *    mergeability theorem. A 1000-executor job ships k longs per shard
  *    to the driver, never the key stream.
  *  - Bloom: the index side collapses to ≤ m distinct int positions
  *    (m bits in the bitmap rendering; the position-set rendering here is
  *    the same information and joins natively). The probe side meets it
  *    as a BROADCAST semi-join — zero shuffle of the probe corpus — and
  *    only bloom-positive rows reach the exact verify join.
  */
object Sketches {

  // ------------------------------------------------------------------ KMV

  /** Bottom-k distinct hashes per shard, two-level so the per-shard
    * selection parallelizes: stage 1 takes bottom-k within (shard, salt)
    * buckets, stage 2 reduces the ≤ salts·k survivors per shard. Input
    * must already be distinct on (shardCol, hashCol).
    */
  def bottomK(
      distinctHashes: DataFrame,
      shardCol: String,
      hashCol: String,
      k: Int,
      salts: Int = 64
  ): DataFrame = {
    val pre = distinctHashes
      .withColumn("_salt", pmod(col(hashCol), lit(salts.toLong)))
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(col(shardCol), col("_salt"))
            .orderBy(col(hashCol))))
      .filter(col("_rn") <= k)
      .drop("_salt", "_rn")
    pre
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(col(shardCol)).orderBy(col(hashCol))))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** 2^60 as an exact double — the portable-hash value range. */
  private val HashSpan = 1152921504606846976L.toDouble

  /** KMV estimate from a bottom-k set: (k−1)·2^60 / h_k when the sketch
    * is full, else the sketch size itself (it holds every distinct hash).
    * All inputs are exact integers; the one division is a fixed-shape
    * IEEE step both engines round identically.
    */
  private def kmvEstimate(nSketch: Column, hk: Column, k: Int): Column =
    when(nSketch < k, nSketch.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpan) / hk.cast("double"))

  /** Sketch-driven JOIN CARDINALITY estimate — the "how big is this join,
    * should it broadcast, how many reducers" planning decision answered
    * WITHOUT running the join: per-key count profiles (one aggregation
    * pass per side) plus ONE KMV key sample over the distinct union of
    * keys. With D̂ the KMV union-distinct estimate and S the k sampled
    * keys (uniform over keys, since the hash order is independent of the
    * counts), Σ_keys cL·cR ≈ (D̂/|S|)·Σ_{key∈S} cL·cR. Keys present on one
    * side only contribute 0 to both sums — the estimator stays unbiased
    * over the union.
    *
    * The exact control value is the per-key count aggregate
    * Σ cL·cR (never materialized pairs), so even the certification side
    * is linear. Portable md5 hash family → the whole row, estimate
    * included, is DuckDB-hash-checkable (q232). The sample is a
    * TakeOrdered (orderBy h, limit k) — metadata-sized, no global window.
    */
  def joinCardinalityEstimate(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      k: Int
  ): DataFrame = {
    val cl = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).cast("long").as("cl"))
    val cr = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).cast("long").as("cr"))
    val unionKeys = cl.select("key").union(cr.select("key")).distinct()
      .localCheckpoint(true)
    val samp = unionKeys
      .withColumn("h", Dedup.portableHash60(col("key").cast("string")))
      .orderBy("h").limit(k)
    val sampStats = samp
      .join(cl, Seq("key"), "left").join(cr, Seq("key"), "left")
      .agg(count(lit(1)).cast("long").as("sampled_keys"),
        max(col("h")).as("_hk"),
        sum(coalesce(col("cl"), lit(0L)) * coalesce(col("cr"), lit(0L)))
          .cast("long").as("_ps"))
    val exact = cl.join(cr, Seq("key"))
      .agg(sum(col("cl") * col("cr")).cast("long").as("exact_join_rows"))
    val du = unionKeys.agg(count(lit(1)).cast("long")
      .as("union_distinct_exact"))
    sampStats.crossJoin(broadcast(exact)).crossJoin(broadcast(du))
      .withColumn("union_distinct_est",
        kmvEstimate(col("sampled_keys"), col("_hk"), k))
      .withColumn("est_join_rows",
        (col("union_distinct_est") / col("sampled_keys").cast("double")) *
          col("_ps").cast("double"))
      .select(col("exact_join_rows"), col("union_distinct_exact"),
        col("sampled_keys"), col("union_distinct_est"),
        col("est_join_rows"),
        ((col("est_join_rows") - col("exact_join_rows").cast("double")) /
          col("exact_join_rows").cast("double")).as("rel_err"))
  }

  /** Per-shard KMV distinct-count estimates plus a merged all-shards row
    * (shard `~all`), each certified against the exact distinct count.
    * The merged row is computed FROM THE SHARD SKETCHES (union → distinct
    * → bottom-k), never from the raw keys — hash-equality with an oracle
    * that computes it from the raw keys is the mergeability proof.
    *
    * Output: (shard, n_exact, kmv_est, rel_err_pct), ordered by shard.
    */
  def kmvCensus(
      df: DataFrame,
      shardCol: String,
      keyCol: String,
      k: Int = 64
  ): DataFrame = {
    val shardSketch = bottomK(kmvHashes(df, shardCol, keyCol), "shard", "h", k)
    kmvCensusCore(shardSketch, df, shardCol, keyCol, k)
  }

  /** PRODUCTION-hash KMV census (the x178 channel): identical shape with
    * the key hash drawn from codegen xxhash64 folded into the SAME
    * [0, 2^60) range the estimator expects (2^64 ≡ 0 mod 2^60, so the
    * fold stays exactly uniform). The md5 portable twin is the oracle
    * contract; this is the form you run at lake scale (the x185
    * precedent applied to sketch family 1).
    */
  def kmvCensusProd(
      df: DataFrame,
      shardCol: String,
      keyCol: String,
      k: Int = 64
  ): DataFrame =
    kmvCensusCore(bottomK(kmvHashesProd(df, shardCol, keyCol), "shard",
      "h", k), df, shardCol, keyCol, k)

  /** The xxhash64 production hash folded into the estimator's [0, 2^60)
    * range (2^64 ≡ 0 mod 2^60, so the fold stays exactly uniform). Null
    * keys dropped — see [[kmvHashes]].
    */
  private[graft] def prodHash60(c: Column): Column =
    pmod(xxhash64(c), lit(1L << 60))

  private[graft] def kmvHashesProd(
      df: DataFrame, shardCol: String, keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(col(shardCol).cast("string").as("shard"),
        prodHash60(col(keyCol).cast("string")).as("h"))
      .distinct()

  /** Incrementally-maintained KMV census: the stored `state` sketch and
    * the `delta` batch's sketch merge by set-union → re-bottom-k (each
    * half's bottom-k supersets its contribution to the union's bottom-k),
    * WITHOUT re-reading the state's raw keys. Output schema == the batch
    * [[kmvCensus]] — the q186 oracle computes the batch form over the
    * full data, so the hash match IS the incremental≡batch proof (the
    * q97/q120/q150 pattern). The exact-count certification columns do
    * re-read both halves — that is the certification harness, not the
    * maintained artifact.
    */
  def kmvCensusIncremental(
      state: DataFrame,
      delta: DataFrame,
      shardCol: String,
      keyCol: String,
      k: Int = 64
  ): DataFrame =
    kmvIncrementalCore(state, delta, shardCol, keyCol, k, prod = false)

  /** PRODUCTION-hash incremental KMV census (the x186 channel): the same
    * state⊕delta set-union → re-bottom-k merge with every hash drawn from
    * codegen xxhash64 folded into [0, 2^60). The md5 twin is the oracle
    * contract (q186); this is the form a 100-TB maintenance job runs —
    * the x178/x185 pattern applied to the incremental path.
    */
  def kmvCensusIncrementalProd(
      state: DataFrame,
      delta: DataFrame,
      shardCol: String,
      keyCol: String,
      k: Int = 64
  ): DataFrame =
    kmvIncrementalCore(state, delta, shardCol, keyCol, k, prod = true)

  private def kmvIncrementalCore(
      state: DataFrame,
      delta: DataFrame,
      shardCol: String,
      keyCol: String,
      k: Int,
      prod: Boolean
  ): DataFrame = {
    def hashes(df: DataFrame): DataFrame =
      if (prod) kmvHashesProd(df, shardCol, keyCol)
      else kmvHashes(df, shardCol, keyCol)
    val s1 = bottomK(hashes(state), "shard", "h", k)
    val s2 = bottomK(hashes(delta), "shard", "h", k)
    val merged = bottomK(s1.unionByName(s2).distinct(), "shard", "h", k)
    kmvCensusCore(merged, state.unionByName(delta), shardCol, keyCol, k)
  }

  /** Distinct (shard, portable-hash) pairs — the only thing KMV ever
    * hashes or shuffles. Null keys are DROPPED before hashing so sketch
    * membership matches the exact-count semantics (count_distinct ignores
    * nulls; a null hashing to a constant would claim a bottom-k slot and
    * bias the estimate).
    */
  private[graft] def kmvHashes(
      df: DataFrame, shardCol: String, keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(col(shardCol).cast("string").as("shard"),
        Dedup.portableHash60(col(keyCol).cast("string")).as("h"))
      .distinct()

  /** Shared census tail: merge the per-shard sketches into the `~all`
    * row, estimate, and certify against exact distincts of `full`.
    */
  private def kmvCensusCore(
      shardSketch0: DataFrame,
      full: DataFrame,
      shardCol: String,
      keyCol: String,
      k: Int
  ): DataFrame = {
    val shardSketch = shardSketch0
      .localCheckpoint(true) // consumed twice: per-shard rows + merge
    // the all-shards merge input is ≤ shards·k longs — TakeOrdered, not a
    // constant-partition window (which Catalyst folds to a GLOBAL window)
    val merged = shardSketch.select(col("h")).distinct()
      .orderBy("h").limit(k)
      .select(lit("~all").as("shard"), col("h"))
    val sketches = shardSketch.unionByName(merged)
      .groupBy("shard")
      .agg(count(lit(1)).cast("long").as("_n_sk"), max(col("h")).as("_hk"))
    val exact = full
      .groupBy(col(shardCol).cast("string").as("shard"))
      .agg(count_distinct(col(keyCol)).as("n_exact"))
    val exactAll = full.agg(count_distinct(col(keyCol)).as("n_exact"))
      .select(lit("~all").as("shard"), col("n_exact"))
    sketches
      .join(broadcast(exact.unionByName(exactAll)), Seq("shard"))
      .select(col("shard"), col("n_exact"),
        round(kmvEstimate(col("_n_sk"), col("_hk"), k), 1).as("kmv_est"),
        round(lit(100.0) *
          abs(kmvEstimate(col("_n_sk"), col("_hk"), k) -
            col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 2).as("rel_err_pct"))
      .orderBy("shard")
  }

  /** Trailing-window distinct-count rollup from per-day KMV sketches —
    * the "distinct users per trailing week" dashboard at 100 TB: the
    * stored artifact is k longs PER DAY; each day's trailing estimate
    * merges only the window's sketches (mergeability in the TIME
    * dimension — the q178 shard proof applied to days). The raw key
    * stream is touched once, to build the day sketches; the rollup join
    * is days × (days·k) — dashboard-sized regardless of corpus size.
    * Exact counts ride along as certification (they re-scan; that is
    * the harness, not the product).
    *
    * Output: (day: string, n_exact, kmv_est, rel_err_pct) per active day.
    */
  def kmvTrailingDistinct(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDays: Int = 7,
      k: Int = 64
  ): DataFrame =
    kmvTrailingCore(df, tsCol, keyCol, windowDays, k, prod = false)

  /** PRODUCTION-hash trailing-window KMV rollup (the x192 channel):
    * identical day-sketch merge with codegen xxhash64 folded into
    * [0, 2^60). The md5 twin is the oracle contract (q192); this is the
    * trailing-distinct dashboard form at lake scale (x178/x185 pattern).
    */
  def kmvTrailingDistinctProd(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDays: Int = 7,
      k: Int = 64
  ): DataFrame =
    kmvTrailingCore(df, tsCol, keyCol, windowDays, k, prod = true)

  private def kmvTrailingCore(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDays: Int,
      k: Int,
      prod: Boolean
  ): DataFrame = {
    val hashes = df.filter(col(keyCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        (if (prod) prodHash60(col(keyCol).cast("string"))
         else Dedup.portableHash60(col(keyCol).cast("string"))).as("h"))
      .distinct()
    val daySk = bottomK(hashes, "day", "h", k).localCheckpoint(true)
    val days = daySk.select("day").distinct()
    val trailing = days.select(col("day").as("t"))
      .join(daySk,
        col("day").between(date_sub(col("t"), windowDays - 1), col("t")))
      .select(col("t"), col("h")).distinct()
    val sk = bottomK(trailing.withColumnRenamed("t", "day"), "day", "h", k)
      .groupBy("day")
      .agg(count(lit(1)).cast("long").as("_n_sk"), max(col("h")).as("_hk"))
    val du = df
      .select(to_date(col(tsCol)).as("d"), col(keyCol).as("u"))
      .distinct()
    val exact = days.select(col("day").as("t"))
      .join(du, col("d").between(date_sub(col("t"), windowDays - 1), col("t")))
      .groupBy(col("t").as("day"))
      .agg(count_distinct(col("u")).as("n_exact"))
    sk.join(exact, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_exact"),
        round(kmvEstimate(col("_n_sk"), col("_hk"), k), 1).as("kmv_est"),
        round(lit(100.0) *
          abs(kmvEstimate(col("_n_sk"), col("_hk"), k) -
            col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 2).as("rel_err_pct"))
      .orderBy("day")
  }

  /** KMV SET OPERATIONS: union/intersection cardinality estimates from
    * two bottom-k sketches alone — the audience-overlap query at 100 TB,
    * answered from 2·k longs instead of two key streams. Theory: the
    * bottom-k of A∪B is contained in bottomK(A) ∪ bottomK(B), Jaccard ≈
    * |{h ∈ U_k : h ∈ SA ∧ h ∈ SB}| / k (the minhash estimator on the
    * union's k-sample), |A∩B| ≈ J·|A∪B|. Exact counts ride along as the
    * certification columns (the q98/q180 harness pattern).
    *
    * Single global sketches use TakeOrdered (per-partition bottom-k →
    * driver merge of k longs), never a constant-partition window.
    */
  def kmvSetOpsCensus(
      keysA: DataFrame,
      keysB: DataFrame,
      keyCol: String,
      k: Int = 256
  ): DataFrame =
    kmvSetOpsCore(keysA, keysB, keyCol, k, prod = false)

  /** PRODUCTION-hash KMV set-ops census (the x190 channel): identical
    * estimator with the key hash drawn from codegen xxhash64 folded into
    * [0, 2^60). The md5 twin is the oracle contract (q190); this is the
    * audience-overlap form you run at lake scale (x178/x185 pattern).
    */
  def kmvSetOpsCensusProd(
      keysA: DataFrame,
      keysB: DataFrame,
      keyCol: String,
      k: Int = 256
  ): DataFrame =
    kmvSetOpsCore(keysA, keysB, keyCol, k, prod = true)

  private def kmvSetOpsCore(
      keysA: DataFrame,
      keysB: DataFrame,
      keyCol: String,
      k: Int,
      prod: Boolean
  ): DataFrame = {
    def hashes(df: DataFrame): DataFrame =
      df.filter(col(keyCol).isNotNull)
        .select((if (prod) prodHash60(col(keyCol).cast("string"))
          else Dedup.portableHash60(col(keyCol).cast("string"))).as("h"))
        .distinct()
    def sketch(df: DataFrame): DataFrame =
      hashes(df).orderBy("h").limit(k)
    val sa = sketch(keysA).localCheckpoint(true)
    val sb = sketch(keysB).localCheckpoint(true)
    val u = sa.unionByName(sb).distinct().orderBy("h").limit(k)
      .localCheckpoint(true)
    val m = u.join(sa, Seq("h"), "left_semi")
      .join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).cast("long").as("_m"))
    val uStats = u.agg(count(lit(1)).cast("long").as("_nu"),
      max(col("h")).as("_hk"))
    val exact = keysA.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("_k")).distinct()
      .withColumn("_inA", lit(1))
      .join(keysB.filter(col(keyCol).isNotNull)
        .select(col(keyCol).as("_k")).distinct()
        .withColumn("_inB", lit(1)), Seq("_k"), "full_outer")
      .agg(
        sum(coalesce(col("_inA"), lit(0))).cast("long").as("n_a"),
        sum(coalesce(col("_inB"), lit(0))).cast("long").as("n_b"),
        sum(coalesce(col("_inA"), lit(0)) * coalesce(col("_inB"), lit(0)))
          .cast("long").as("n_inter"),
        count(lit(1)).cast("long").as("n_union"))
    val unionEst = when(col("_nu") < k, col("_nu").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpan) /
        col("_hk").cast("double"))
    // Jaccard divides by the SAMPLE size: k when the union sketch is
    // full, |U| when under-full (then m/|U| is the exact Jaccard)
    val jacc = col("_m").cast("double") /
      least(col("_nu"), lit(k.toLong)).cast("double")
    exact.crossJoin(m).crossJoin(uStats)
      .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
        round(jacc, 4).as("jaccard_est"),
        round(jacc * unionEst, 1).as("inter_est"),
        round(unionEst, 1).as("union_est"))
  }

  // ------------------------------------------------------------ Count-Min

  /** Count-Min sketch certification census over the whitespace-token
    * stream of `textCol`: build a depth×width counter grid (row r uses
    * the salted portable hash `md5("cm<r>|" + token) mod width`), then
    * for the top-`topK` exact tokens report the CMS point estimate
    * next to the exact count — est ≥ exact always; the overcount column
    * shows the collision error the width buys.
    *
    * Scale shape: the sketch build is ONE map-side-combined aggregation
    * into depth·width cells (the whole sketch is a few KB and merges by
    * cell-wise addition across shards — the mergeable-sketch property);
    * the exact path here is the certification harness, exactly like the
    * q98/q180 pattern — production keeps only the sketch.
    */
  def countMinCensus(
      df: DataFrame,
      textCol: String,
      width: Int = 16,
      depth: Int = 3,
      topK: Int = 20
  ): DataFrame =
    cmCensusCore(cmCells(df, textCol, width, depth), df, textCol,
      width, depth, topK)

  /** PRODUCTION-hash Count-Min census (the x185 channel): identical
    * shape to [[countMinCensus]] with every (row, token) position drawn
    * from codegen xxhash64 instead of the md5-derived portable twin. The
    * hash choice is the ORACLE contract, not the algorithm — at lake
    * scale the 8-byte hash is the form you run (the q25/q69 minhash
    * precedent: portable twin for the DuckDB gate, xxhash64 in
    * production).
    */
  def countMinCensusProd(
      df: DataFrame,
      textCol: String,
      width: Int = 16,
      depth: Int = 3,
      topK: Int = 20
  ): DataFrame =
    cmCensusCore(cmCells(df, textCol, width, depth, prod = true), df,
      textCol, width, depth, topK, prod = true)

  /** Incrementally-maintained Count-Min census: the stored `state` grid
    * and the `delta` batch's grid merge by CELL-WISE ADDITION (the CMS
    * mergeability property — counters are linear), never re-reading the
    * state's token stream. Output schema == [[countMinCensus]]; the q194
    * oracle computes the batch form over the full data, so the hash match
    * is the incremental≡batch proof (the q186 pattern for the second
    * sketch family).
    */
  def countMinCensusIncremental(
      state: DataFrame,
      delta: DataFrame,
      textCol: String,
      width: Int = 16,
      depth: Int = 3,
      topK: Int = 20
  ): DataFrame =
    cmIncrementalCore(state, delta, textCol, width, depth, topK,
      prod = false)

  /** PRODUCTION-hash incremental Count-Min census (the x194 channel):
    * the same cell-wise grid addition with xxhash64 positions. The md5
    * twin is the oracle contract (q194) — the x185 pattern applied to
    * the incremental path.
    */
  def countMinCensusIncrementalProd(
      state: DataFrame,
      delta: DataFrame,
      textCol: String,
      width: Int = 16,
      depth: Int = 3,
      topK: Int = 20
  ): DataFrame =
    cmIncrementalCore(state, delta, textCol, width, depth, topK,
      prod = true)

  private def cmIncrementalCore(
      state: DataFrame,
      delta: DataFrame,
      textCol: String,
      width: Int,
      depth: Int,
      topK: Int,
      prod: Boolean
  ): DataFrame = {
    val merged = cmCells(state, textCol, width, depth, prod)
      .unionByName(cmCells(delta, textCol, width, depth, prod))
      .groupBy("r", "pos")
      .agg(sum(col("cnt")).as("cnt"))
    cmCensusCore(merged, state.unionByName(delta), textCol,
      width, depth, topK, prod)
  }

  /** "cm" || r || "|" || token — identical salted string both engines;
    * `prod` swaps in codegen xxhash64 over the same salted inputs.
    */
  private def cmPosOf(r: Column, c: Column, width: Int,
      prod: Boolean = false): Column =
    pmod(
      if (prod) xxhash64(lit("cm"), r.cast("string"), lit("|"), c)
      else Dedup.portableHash60(
        concat(lit("cm"), r.cast("string"), lit("|"), c)),
      lit(width.toLong))

  private def cmTokens(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "")

  /** The depth×width counter grid of a corpus — the mergeable artifact. */
  private[graft] def cmCells(
      df: DataFrame, textCol: String, width: Int, depth: Int,
      prod: Boolean = false): DataFrame =
    cmTokens(df, textCol)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"),
        col("token"))
      .select(col("r"),
        cmPosOf(col("r"), col("token"), width, prod).as("pos"))
      .groupBy("r", "pos")
      .agg(count(lit(1)).as("cnt"))

  /** Shared census tail: probe the grid with the top-`topK` exact tokens
    * of `full` (the certification harness).
    */
  private def cmCensusCore(
      cells: DataFrame,
      full: DataFrame,
      textCol: String,
      width: Int,
      depth: Int,
      topK: Int,
      prod: Boolean = false
  ): DataFrame = {
    val exact = cmTokens(full, textCol).groupBy("token")
      .agg(count(lit(1)).cast("long").as("n_exact"))
      .orderBy(desc("n_exact"), asc("token"))
      .limit(topK)
    val probes = exact.select(col("token"), col("n_exact"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          cmPosOf(lit(r), col("token"), width, prod).as("pos"))): _*))
        .as("_p"))
      .select(col("token"), col("n_exact"),
        col("_p.r").as("r"), col("_p.pos").as("pos"))
    probes.join(broadcast(cells), Seq("r", "pos"))
      .groupBy("token", "n_exact")
      .agg(min(col("cnt")).cast("long").as("cms_est"))
      .select(col("token"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).as("overcount"))
      .orderBy(desc("n_exact"), asc("token"))
  }

  // ---------------------------------------------------------------- Bloom

  /** The kH probe positions of a text in an m-slot Bloom filter, via
    * double hashing pos_i = (h1 + i·h2) mod m with two independent
    * portable hashes. Magnitude guard: h1 + (kH−1)·h2 < kH·2^60, which
    * stays inside int64 for kH ≤ 7 — Spark and DuckDB agree exactly
    * (no overflow wrap on either side).
    */
  def bloomPositions(textCol: Column, m: Int, kH: Int): Column =
    bloomPositionsOf(textCol, m, kH, prod = false)

  /** The production-hash probe positions: both double-hashing bases drawn
    * from codegen xxhash64 (independent via the "b2|" salt), folded into
    * [0, 2^60) so the same magnitude guard (h1 + (kH−1)·h2 < kH·2^60 ≤
    * int64 max for kH ≤ 7) holds exactly.
    */
  def bloomPositionsProd(textCol: Column, m: Int, kH: Int): Column =
    bloomPositionsOf(textCol, m, kH, prod = true)

  private def bloomPositionsOf(
      textCol: Column, m: Int, kH: Int, prod: Boolean): Column = {
    require(kH <= 7, s"kH=$kH would overflow int64 position math")
    val h1 = if (prod) prodHash60(textCol) else Dedup.portableHash60(textCol)
    val h2 = if (prod) prodHash60(concat(lit("b2|"), textCol))
      else Dedup.portableHash60(concat(lit("b2|"), textCol))
    transform(sequence(lit(0), lit(kH - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(m.toLong)))
  }

  /** Bloom-pre-filtered incremental dedup census: build the position set
    * from `index`, probe every `probe` row (bloom-positive ⇔ ALL its
    * distinct positions present), then resolve bloom-positives with the
    * exact content join. One row:
    * (n_probe, n_bloom_pass, n_true_dup, n_false_pos, fp_pct).
    *
    * The exact verify only ever sees bloom-positive rows — at lake scale
    * that is the point: the m-bounded position set broadcasts, the probe
    * corpus never shuffles, and the expensive exact join runs on the
    * (tiny) candidate stream instead of the corpus.
    */
  def bloomPrefilterCensus(
      index: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      m: Int = 1 << 15,
      kH: Int = 5
  ): DataFrame =
    bloomPrefilterCore(index, probe, idCol, textCol, m, kH, prod = false)

  /** PRODUCTION-hash Bloom pre-filter census (the x179 channel): the same
    * broadcast position-set / probe / exact-verify shape with every probe
    * position drawn from codegen xxhash64 (see [[bloomPositionsProd]]).
    * The md5 twin is the oracle contract (q179); this is the form an
    * incremental-dedup gate runs at lake scale (x178/x185 pattern).
    */
  def bloomPrefilterCensusProd(
      index: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      m: Int = 1 << 15,
      kH: Int = 5
  ): DataFrame =
    bloomPrefilterCore(index, probe, idCol, textCol, m, kH, prod = true)

  private def bloomPrefilterCore(
      index: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      m: Int,
      kH: Int,
      prod: Boolean
  ): DataFrame = {
    val posSet = index
      .select(explode(bloomPositionsOf(col(textCol), m, kH, prod)).as("pos"))
      .distinct()
    val probePos = probe
      .select(col(idCol).as("_pid"),
        explode(array_distinct(bloomPositionsOf(col(textCol), m, kH, prod)))
          .as("pos"))
    val perDoc = probePos
      .join(broadcast(posSet.withColumn("_hit", lit(1))), Seq("pos"), "left")
      .groupBy("_pid")
      .agg((count(lit(1)) === sum(coalesce(col("_hit"), lit(0))))
        .as("_pass"))
    val passed = perDoc.filter(col("_pass"))
      .join(probe.select(col(idCol).as("_pid"),
        Dedup.contentHash(Seq(textCol)).as("_ch")), Seq("_pid"))
    val indexHashes = index
      .select(Dedup.contentHash(Seq(textCol)).as("_ch")).distinct()
    val verified = passed
      .join(indexHashes.withColumn("_dup", lit(1)), Seq("_ch"), "left")
      .agg(count(lit(1)).cast("long").as("n_bloom_pass"),
        coalesce(sum(coalesce(col("_dup"), lit(0))), lit(0L)).cast("long")
          .as("n_true_dup"))
    probe.agg(count(lit(1)).cast("long").as("n_probe"))
      .crossJoin(verified)
      .select(col("n_probe"), col("n_bloom_pass"), col("n_true_dup"),
        (col("n_bloom_pass") - col("n_true_dup")).as("n_false_pos"),
        round(lit(100.0) *
          (col("n_bloom_pass") - col("n_true_dup")).cast("double") /
          col("n_probe").cast("double"), 3).as("fp_pct"))
  }

  // ------------------------------------------------------------ Histogram

  /** Fixed-grid histogram sketch of `valCol` per day: bucket = clamp
    * (⌊v/width⌋, 0, nBuckets−1). The mergeable quantile artifact — counters
    * are linear, so per-shard grids merge by CELL-WISE ADDITION across
    * shards AND across days (the Count-Min property applied to the value
    * axis), and any trailing window's quantile comes from ≤ nBuckets ints
    * per member day, never from the raw rows.
    */
  private[graft] def dayHistogram(
      df: DataFrame,
      tsCol: String,
      valCol: String,
      width: Double,
      nBuckets: Int
  ): DataFrame =
    df.filter(col(valCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        least(greatest(floor(col(valCol).cast("double") / lit(width)),
          lit(0.0)), lit((nBuckets - 1).toDouble)).cast("long").as("bucket"))
      .groupBy("day", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Trailing-window quantile rollup from per-day histogram sketches —
    * the "P50/P90 latency per trailing week" dashboard at 100 TB. The
    * stored artifact is ≤ nBuckets counters PER DAY (the q192 KMV pattern
    * applied to ORDER STATISTICS); each day's trailing histogram merges
    * only the window's grids, and the quantile readout walks the merged
    * grid's cumulative counts with INTEGER rank math (rank = ⌈q·W⌉, the
    * bucket's lower bound is the estimate — never a float comparison that
    * could leak into the answer, the q125 discipline). The exact lower
    * quantiles ride along as certification (they re-scan the window's raw
    * rows; that is the harness, not the product — est is always within
    * one bucket width of exact, which the spec pins).
    *
    * Output per active day: (day, n, p50_est, p50_exact, p90_est,
    * p90_exact) where p50_est = lower bound of the bucket holding rank
    * ⌈W/2⌉ and p50_exact = the rank-⌈W/2⌉ value itself.
    */
  def histTrailingQuantiles(
      df: DataFrame,
      tsCol: String,
      valCol: String,
      windowDays: Int = 7,
      width: Double = 8.0,
      nBuckets: Int = 64
  ): DataFrame = {
    val hist = dayHistogram(df, tsCol, valCol, width, nBuckets)
      .localCheckpoint(true)
    val days = hist.select("day").distinct()
    // merge the window's day-grids cell-wise (mergeability in TIME)
    val merged = days.select(col("day").as("t"))
      .join(hist,
        col("day").between(date_sub(col("t"), windowDays - 1), col("t")))
      .groupBy("t", "bucket")
      .agg(sum(col("cnt")).as("cnt"))
    val totals = merged.groupBy("t").agg(sum(col("cnt")).as("w"))
    val r50 = floor((col("w") + 1) / lit(2L)) // ceil(W/2)
    val r90 = floor((col("w") * 9 + 9) / lit(10L)) // ceil(9W/10)
    val cum = merged.join(totals, Seq("t"))
      .withColumn("_cum", sum(col("cnt")).over(
        Window.partitionBy("t").orderBy("bucket")))
    // per quantile: holding bucket + WITHIN-bucket rank (r − cum_below) —
    // the q125 histogram-refinement locator, read straight off the grid
    def target(rank: Column): Column =
      min(when(col("_cum") >= rank,
        struct(col("bucket"),
          (rank - (col("_cum") - col("cnt"))).as("rib"))))
    val est = cum.groupBy("t", "w")
      .agg(target(r50).as("_t50"), target(r90).as("_t90"))
      .localCheckpoint(true)
    // certification: resolve the exact rank value INSIDE the located
    // bucket only (≈ 1/nBuckets of each window's rows ever reach a sort;
    // the q125 refinement — never a whole-window row_number)
    val tg = est.select(col("t"), explode(array(
        struct(lit("p50").as("which"), col("_t50.bucket").as("bucket"),
          col("_t50.rib").as("rib")),
        struct(lit("p90").as("which"), col("_t90.bucket").as("bucket"),
          col("_t90.rib").as("rib")))).as("_x"))
      .select(col("t"), col("_x.which").as("which"),
        col("_x.bucket").as("bucket"), col("_x.rib").as("rib"))
    val raw = df.filter(col(valCol).isNotNull)
      .select(to_date(col(tsCol)).as("d"),
        col(valCol).cast("double").as("v"),
        least(greatest(floor(col(valCol).cast("double") / lit(width)),
          lit(0.0)), lit((nBuckets - 1).toDouble)).cast("long").as("bucket"))
    val exact = broadcast(tg).join(raw,
        tg("bucket") === raw("bucket") &&
          col("d").between(date_sub(col("t"), windowDays - 1), col("t")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("t", "which").orderBy(col("v"))))
      .filter(col("_rn") === col("rib"))
      .groupBy("t")
      .agg(min(when(col("which") === "p50", col("v"))).as("p50_exact"),
        min(when(col("which") === "p90", col("v"))).as("p90_exact"))
    est.join(exact, Seq("t"))
      .select(date_format(col("t"), "yyyy-MM-dd").as("day"),
        col("w").cast("long").as("n"),
        (col("_t50.bucket") * lit(width)).as("p50_est"), col("p50_exact"),
        (col("_t90.bucket") * lit(width)).as("p90_est"), col("p90_exact"))
      .orderBy("day")
  }

  /** The ≤ nBuckets-row counter grid of a value stream — the mergeable
    * histogram artifact (cell-wise addition, like cmCells).
    */
  private[graft] def histGrid(
      df: DataFrame, valCol: String, width: Double, nBuckets: Int): DataFrame =
    df.filter(col(valCol).isNotNull)
      .select(histBucket(col(valCol), width, nBuckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** EXACT per-group TRIMMED MEAN without a whole-group sort: mean of the
    * ranks [k+1, W−k] (k = ⌊W/10⌋ per side), computed as
    * (S_total − S_bottomK − S_topK) / (W − 2k) where each tail sum comes
    * from the histogram grid — full buckets outside the cut plus the
    * within-cut-bucket prefix resolved by sorting ONLY that bucket's rows
    * (the q196 refinement applied to PARTIAL SUMS, not just rank picks).
    * Every value sum routes through DECIMAL(18,6): order-independent, so
    * a tie crossing the cut contributes identically however it lands.
    * The robust-mean readout for metrics pipelines at lake scale.
    *
    * Output per group: (group, n, k_trim, mean_raw, trimmed_mean).
    */
  def trimmedMeanByGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      width: Double = 8.0,
      nBuckets: Int = 64
  ): DataFrame =
    robustMeansByGroup(df, groupCol, valCol, width, nBuckets)
      .select(groupCol, "n", "k_trim", "mean_raw", "trimmed_mean")

  /** WINSORIZED mean companion: the k tail values per side are CLAMPED to
    * the cut values v_(k+1) / v_(W−k) instead of dropped — same grid
    * decomposition plus two rank PICKS resolved in the same cut buckets.
    * Output: (group, n, k_trim, mean_raw, winsorized_mean).
    */
  def winsorizedMeanByGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      width: Double = 8.0,
      nBuckets: Int = 64
  ): DataFrame =
    robustMeansByGroup(df, groupCol, valCol, width, nBuckets)
      .select(groupCol, "n", "k_trim", "mean_raw", "winsorized_mean")

  /** Shared core for the robust means: tail SUMS (full outside buckets +
    * within-cut-bucket prefixes) and cut-value PICKS (ranks k+1 and W−k)
    * all resolved inside at most four located buckets per group.
    */
  private def robustMeansByGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      width: Double,
      nBuckets: Int
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    // null groups drop explicitly (ADVICE r4): a null g would survive the
    // grid/targets aggregation but the equi-join back would lose its
    // cut-bucket rows, silently zeroing that group's trimmed mean
    val rows = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"),
        histBucket(col(valCol), width, nBuckets).as("bucket"))
      .localCheckpoint(true)
    val grid = rows.groupBy("g", "bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast(dec)).cast(dec).as("s"))
    val tot = grid.groupBy("g")
      .agg(sum(col("cnt")).as("w"), sum(col("s")).cast(dec).as("stot"))
    val k = floor(col("w") / lit(10.0)) // ⌊W/10⌋ per side
    val wAsc = Window.partitionBy("g").orderBy("bucket")
    val wDesc = Window.partitionBy("g").orderBy(desc("bucket"))
    val cum = grid.join(tot, Seq("g"))
      .withColumn("_ca", sum(col("cnt")).over(wAsc))
      .withColumn("_sa", sum(col("s")).over(wAsc).cast(dec))
      .withColumn("_cd", sum(col("cnt")).over(wDesc))
      .withColumn("_sd", sum(col("s")).over(wDesc).cast(dec))
    // per tail: cut bucket (FIRST from that tail's end whose cumulative
    // count reaches k — min bucket for the low tail, max for the high),
    // how many of its rows belong to the tail (rem), and the tail's
    // FULL-bucket part of the sum
    def tailStruct(cumCnt: Column, cumSum: Column) =
      when(cumCnt >= k, struct(col("bucket"),
        (k - (cumCnt - col("cnt"))).as("rem"),
        (cumSum - col("s")).cast(dec).as("below")))
    // cut-value picks: rank k+1 from each end (the winsorized clamp values)
    def pickStruct(cumCnt: Column) =
      when(cumCnt >= k + 1, struct(col("bucket"),
        (k + 1 - (cumCnt - col("cnt"))).as("rem")))
    val targets = cum.groupBy("g")
      .agg(max(col("w")).as("w"), max(col("stot")).as("stot"),
        max(k).as("k"),
        min(tailStruct(col("_ca"), col("_sa"))).as("_lo"),
        max(tailStruct(col("_cd"), col("_sd"))).as("_hi"),
        min(pickStruct(col("_ca"))).as("_lp"),
        max(pickStruct(col("_cd"))).as("_hp"))
      .localCheckpoint(true)
    // resolve the within-bucket prefixes: only the two cut buckets' rows
    // per group ever reach a sort, ~2/nBuckets of each group
    val tg = targets.select(col("g"), explode(array(
        struct(lit("losum").as("side"), col("_lo.bucket").as("bucket"),
          col("_lo.rem").as("rem")),
        struct(lit("hisum").as("side"), col("_hi.bucket").as("bucket"),
          col("_hi.rem").as("rem")),
        struct(lit("lopick").as("side"), col("_lp.bucket").as("bucket"),
          col("_lp.rem").as("rem")),
        struct(lit("hipick").as("side"), col("_hp.bucket").as("bucket"),
          col("_hp.rem").as("rem")))).as("_x"))
      .select(col("g"), col("_x.side").as("side"),
        col("_x.bucket").as("bucket"), col("_x.rem").as("rem"))
      .filter(col("rem") > 0)
    val asc = col("side").isin("losum", "lopick")
    val inBucket = broadcast(tg).join(rows, Seq("g", "bucket"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("g", "side").orderBy(
          when(asc, col("v")).otherwise(-col("v")))))
      .filter(when(col("side").isin("losum", "hisum"),
        col("_rn") <= col("rem")).otherwise(col("_rn") === col("rem")))
      .groupBy("g")
      .agg(sum(when(col("side") === "losum", col("v").cast(dec))
          .otherwise(lit(0).cast(dec))).cast(dec).as("_plo"),
        sum(when(col("side") === "hisum", col("v").cast(dec))
          .otherwise(lit(0).cast(dec))).cast(dec).as("_phi"),
        min(when(col("side") === "lopick", col("v"))).as("_vlo"),
        min(when(col("side") === "hipick", col("v"))).as("_vhi"))
    val interior =
      col("stot") - col("_lo.below") - coalesce(col("_plo"),
        lit(0).cast(dec)) -
        col("_hi.below") - coalesce(col("_phi"), lit(0).cast(dec))
    targets.join(inBucket, Seq("g"), "left")
      .select(col("g").as(groupCol), col("w").cast("long").as("n"),
        col("k").cast("long").as("k_trim"),
        (col("stot").cast("double") / col("w").cast("double"))
          .as("mean_raw"),
        (interior.cast("double") /
          (col("w") - lit(2) * col("k")).cast("double"))
          .as("trimmed_mean"),
        ((interior +
          col("k") * coalesce(col("_vlo").cast(dec), lit(0).cast(dec)) +
          col("k") * coalesce(col("_vhi").cast(dec), lit(0).cast(dec)))
          .cast("double") / col("w").cast("double"))
          .as("winsorized_mean"))
      .orderBy(groupCol)
  }

  /** Bucket expression shared by the histogram family. */
  private def histBucket(v: Column, width: Double, nBuckets: Int): Column =
    least(greatest(floor(v.cast("double") / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("long")

  /** Incrementally-maintained histogram quantile census: the stored
    * `state` grid and the `delta` batch's grid merge by CELL-WISE
    * ADDITION (counters are linear — the q194 Count-Min property applied
    * to the value axis), never re-reading state values; the P50/P90
    * readout walks the merged grid with integer ceil-ranks, and the exact
    * certification resolves each rank INSIDE its located bucket (the
    * q196 refinement). The oracle computes the batch form over the full
    * stream, so the hash match is the incremental≡batch proof — the
    * third sketch family (KMV q186, CMS q194, histogram q203) closing
    * the mergeability matrix.
    *
    * Output: one row (n, p50_est, p50_exact, p90_est, p90_exact).
    */
  def histQuantileIncremental(
      state: DataFrame,
      delta: DataFrame,
      valCol: String,
      width: Double = 8.0,
      nBuckets: Int = 64
  ): DataFrame = {
    def grid(df: DataFrame): DataFrame = histGrid(df, valCol, width, nBuckets)
    // the merged grid is THE maintained artifact: ≤ nBuckets counter rows
    val g = grid(state).unionByName(grid(delta))
      .groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint(true)
    val tot = g.agg(sum(col("cnt")).as("w"))
    val r50 = floor((col("w") + 1) / lit(2L))
    val r90 = floor((col("w") * 9 + 9) / lit(10L))
    // cumulative counts WITHOUT a constant-partition window (the q186
    // lesson): triangular self-join on the ≤ nBuckets-row grid
    val cum = g.select(col("bucket"), col("cnt"))
      .join(broadcast(g.select(col("bucket").as("_b2"),
        col("cnt").as("_c2"))), col("_b2") <= col("bucket"))
      .groupBy("bucket", "cnt")
      .agg(sum(col("_c2")).as("_cum"))
      .crossJoin(broadcast(tot))
    def target(rank: Column): Column =
      min(when(col("_cum") >= rank,
        struct(col("bucket"),
          (rank - (col("_cum") - col("cnt"))).as("rib"))))
    val est = cum.groupBy("w")
      .agg(target(r50).as("_t50"), target(r90).as("_t90"))
      .localCheckpoint(true)
    val tg = est.select(explode(array(
        struct(lit("p50").as("which"), col("_t50.bucket").as("bucket"),
          col("_t50.rib").as("rib")),
        struct(lit("p90").as("which"), col("_t90.bucket").as("bucket"),
          col("_t90.rib").as("rib")))).as("_x"))
      .select(col("_x.which").as("which"), col("_x.bucket").as("bucket"),
        col("_x.rib").as("rib"))
    val raw = state.unionByName(delta)
      .filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"),
        histBucket(col(valCol), width, nBuckets).as("bucket"))
    val exact = broadcast(tg).join(raw, Seq("bucket"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("which").orderBy(col("v"))))
      .filter(col("_rn") === col("rib"))
      .agg(min(when(col("which") === "p50", col("v"))).as("p50_exact"),
        min(when(col("which") === "p90", col("v"))).as("p90_exact"))
    est.crossJoin(exact)
      .select(col("w").cast("long").as("n"),
        (col("_t50.bucket") * lit(width)).as("p50_est"), col("p50_exact"),
        (col("_t90.bucket") * lit(width)).as("p90_est"), col("p90_exact"))
  }
}
