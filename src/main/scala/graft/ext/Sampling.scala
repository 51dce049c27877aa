package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling/splitting operators for training-data pipelines. */
object Sampling {

  /** Stable hash bucket in [0, 100) from a key column: md5 of the string
    * form, first 16 bits, mod 100. Engine-portable (md5 is md5 everywhere),
    * so the same row lands in the same split in any system — the property
    * a held-out set needs.
    */
  def hashBucket(key: Column, salt: String = ""): Column =
    (conv(substring(md5(concat(lit(salt), key.cast("string")).cast("binary")),
      1, 4), 16, 10).cast("int") % 100)

  /** Deterministic train/holdout split: adds a `split` column. Rows don't
    * move between splits when the dataset grows — membership depends only
    * on the key (+salt).
    */
  def deterministicSplit(
      df: DataFrame,
      keyCol: String,
      trainPct: Int = 80,
      salt: String = ""
  ): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), salt) < trainPct, "train")
        .otherwise("holdout"))

  /** Stratified sampling: per-stratum fractions via Spark's stratified
    * sampler (one pass, no shuffle). Strata not in `fractions` default to
    * `defaultFraction`.
    *
    * The distinct strata are collected to the driver to complete the
    * fraction map — correct for categorical strata, a footgun on a
    * high-cardinality key — so the collect is capped at `maxStrata`
    * (fetching maxStrata+1 keys, never the full set) and fails fast with
    * a clear error instead of silently materializing millions of keys.
    * For genuinely high-cardinality strata use `hashBucket` + a bucket
    * predicate instead (pure expressions, nothing on the driver).
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Long = 42L,
      maxStrata: Int = 10000
  ): DataFrame = {
    val keys = df.select(strataCol).distinct()
      .limit(maxStrata + 1).collect().map(_.get(0)).toSeq
    require(keys.length <= maxStrata,
      s"stratifiedSample: column '$strataCol' has more than $maxStrata " +
        "distinct strata; use Sampling.hashBucket for high-cardinality keys " +
        "or raise maxStrata explicitly")
    val full = keys.map(k =>
      k -> fractions.getOrElse(String.valueOf(k), defaultFraction)).toMap
    df.stat.sampleBy(strataCol, full, seed)
  }

  /** Temperature-weighted mixture sampling: draw ~`targetRows` documents
    * with per-group rates proportional to n^alpha (alpha<1 up-weights small
    * domains — the standard training-mix move), deterministically.
    *
    * Rates: w_g = round(n_g^alpha, 6); rate_g = min(1, (w_g/Σw)·target/n_g);
    * a row is kept iff md5-hash(salt:id) mod 1e6 < floor(rate_g·1e6).
    * Membership depends only on (id, salt) and the group SIZES, so the
    * sample is reproducible across engines and stable under row order —
    * and the per-group rates adapt as the corpus grows, unlike a fixed
    * fraction map.
    *
    * Every step is engine-portable exact arithmetic: n^alpha is IEEE sqrt
    * for alpha=0.5 (correctly rounded everywhere), the weight sum routes
    * through DECIMAL (order-independent), divisions/multiplies are single
    * correctly-rounded double ops in a fixed order, and the threshold
    * compare is integer. One aggregate (tiny, broadcast) + one scan: no
    * per-row shuffle, so this runs at corpus scale as a map-side filter.
    */
  def mixtureSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      targetRows: Long,
      alpha: Double = 0.5,
      salt: String = "mix"
  ): DataFrame = {
    val wExpr =
      if (alpha == 0.5) sqrt(col("n_g").cast("double"))
      else pow(col("n_g").cast("double"), alpha)
    val rates = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_g"))
      .withColumn("_w", round(wExpr, 6)
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
    val total = broadcast(rates.agg(sum(col("_w")).as("_total")))
    val ppm = rates.crossJoin(total)
      .withColumn("sample_ppm",
        floor(least(lit(1.0),
          col("_w").cast("double") / col("_total").cast("double")
            * targetRows.toDouble / col("n_g").cast("double"))
          * 1000000.0).cast("long"))
      .select(col(groupCol), col("n_g"), col("sample_ppm"))
    val h = pmod(
      conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))
        .cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    df.join(broadcast(ppm.drop("n_g")), Seq(groupCol))
      .filter(h < col("sample_ppm"))
  }

  /** Weighted priority sample (Duffield–Lund–Thorup, "priority sampling"):
    * each row draws a deterministic uniform u ∈ (0,1] from a hash of its
    * key and gets priority w/u; the sample is the top-k priorities.
    * Inclusion probability ≈ min(1, k·w/Σw) — the quality-weighted corpus
    * subsample — yet membership is a pure function of (key, weight), so
    * the sample is stable under re-runs and across engines.
    *
    * Scale design: top-k-by-priority is exactly Spark's
    * TakeOrderedAndProject — each partition keeps its local top-k and only
    * k·partitions tiny rows reach the driver; no global sort, no shuffle
    * of the corpus. The same mergeability is what makes the scheme
    * streamable.
    *
    * The default hash is the engine-portable md5-prefix form (DuckDB twin:
    * `('0x'||substr(md5(CAST(key AS VARCHAR)),1,15))::BIGINT`); pass an
    * xxhash64-based `hashFn` for maximum scan throughput when portability
    * is not needed.
    */
  def prioritySample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      hashFn: Column => Column =
        c => Dedup.portableHash60(c.cast("string"))
  ): DataFrame = {
    val u = (hashFn(col(keyCol)) + lit(1L)).cast("double") /
      lit((1L << 60).toDouble)
    df.withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
  }

  /** Group-safe (leakage-safe) train/val/test split: rows sharing a
    * content group — here, identical normalized content hash; the same
    * machinery accepts any cluster id — are assigned as a UNIT, keyed by
    * the group representative's portable hash, so duplicate documents can
    * never straddle the train/holdout boundary and leak eval data into
    * training. The per-split summary carries `max_splits_per_group`,
    * which the construction pins at 1 — the leakage-safety proof rides
    * the output.
    *
    * Scale: one (hash → min id) aggregate and one co-partitioned join on
    * the hash (both sides shuffle on `ch` once); split assignment is a
    * scan-side expression on the representative id.
    */
  def groupSafeSplit(
      df: DataFrame,
      idCol: String,
      contentCol: String
  ): DataFrame = {
    val g = df.select(col(idCol).as("_id"),
      Dedup.portableHash60(col(contentCol)).as("ch"))
    val rep = g.groupBy("ch").agg(min(col("_id")).as("rep"))
    val bucket = pmod(Dedup.portableHash60(col("rep").cast("string")), lit(10L))
    val assigned = g.join(rep, "ch")
      .select(col("_id"), col("ch"),
        when(bucket < 8, "train")
          .when(bucket === 8, "val")
          .otherwise("test").as("split"))
    val span = broadcast(
      assigned.groupBy("ch")
        .agg(countDistinct(col("split")).as("ns"))
        .agg(max(col("ns")).cast("long").as("max_splits_per_group")))
    val tot = broadcast(assigned.agg(count(lit(1)).cast("long").as("_tot")))
    assigned
      .groupBy("split")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("ch")).cast("long").as("n_groups"))
      .crossJoin(tot)
      .crossJoin(span)
      .select(col("split"), col("n_docs"), col("n_groups"),
        round(col("n_docs").cast("double") / col("_tot").cast("double"), 6)
          .as("share"),
        col("max_splits_per_group"))
      .orderBy("split")
  }

  /** MIXTURE REWEIGHTING: per-source importance weights that reshape the
    * observed corpus mix into a target mix (here the deterministic
    * descending-linear target (K+1−rank)/ΣK, rank = ascending source
    * name), plus the corpus EFFECTIVE SAMPLE SIZE (Σnw)²/(Σnw²) those
    * weights cost — the readout a mixture-tuning loop (DoReMi-style)
    * gates on: ESS ≪ N means the reweighting is spending most of the
    * corpus.
    *
    * Scale shape: one count-by-source aggregation; everything after runs
    * on the bounded source dimension (driver-side ascending fold for the
    * ESS sums — order-pinned so the DuckDB twin's ordered list_sum
    * reproduces the identical IEEE sequence, the q182/q184 pattern).
    */
  def mixtureReweight(docs: DataFrame, sourceCol: String): DataFrame = {
    val per = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .localCheckpoint(true)
    // explicit dirty-bronze contract (ADVICE r4): a null source would NPE
    // the driver-side sort and could never equi-join its rank back
    require(per.filter(col("source").isNull).isEmpty,
      s"mixtureReweight: null values in source column '$sourceCol' — " +
        "clean or filter the corpus first")
    val srcs = per.select("source").collect().map(_.getString(0)).sorted
    val k = srcs.length
    val den = (k * (k + 1) / 2).toDouble
    val ranks = docs.sparkSession.createDataFrame(
      srcs.zipWithIndex.toIndexedSeq
        .map { case (s, i) => (s, (k - i).toDouble / den) })
      .toDF("source", "target_frac")
    val tot = per.agg(sum(col("n_docs")).cast("long").as("_nn"))
    val weighted = per.join(broadcast(ranks), Seq("source")).crossJoin(tot)
      .withColumn("weight", col("target_frac") /
        (col("n_docs").cast("double") / col("_nn").cast("double")))
      .withColumn("eff_docs", col("n_docs").cast("double") * col("weight"))
      .localCheckpoint(true)
    val rows = weighted.select("source", "eff_docs", "weight")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val s1 = rows.foldLeft(0.0) { case (acc, (_, nw, _)) => acc + nw }
    val s2 = rows.foldLeft(0.0) { case (acc, (_, nw, w)) => acc + nw * w }
    weighted
      .select(col("source"), col("n_docs"), col("target_frac"),
        col("weight"), col("eff_docs"),
        lit(s1 * s1 / s2).as("corpus_ess"))
      .orderBy("source")
  }

  /** CURRICULUM MIXING SCHEDULE: per training epoch, integer token quotas
    * per source that interpolate linearly from the NATURAL corpus mix
    * (epoch-0 shape) to the [[mixtureReweight]] TARGET mix by the final
    * epoch, apportioned with LARGEST-REMAINDER (Hamilton) rounding so
    * every epoch's quotas sum to EXACTLY `budget` — the schedule a
    * data-loader executes verbatim. Fraction e/E is an exact dyadic for
    * E = 4, so every interpolated share is a fixed IEEE shape; the
    * remainder ranking sorts doubles both engines order identically.
    *
    * Scale shape: one count-by-source pass; the schedule itself is
    * epochs × sources rows with per-epoch windows on a real column.
    */
  def curriculumSchedule(
      docs: DataFrame,
      sourceCol: String,
      epochs: Int = 4,
      budget: Long = 100000L
  ): DataFrame = {
    val per = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .localCheckpoint(true)
    require(per.filter(col("source").isNull).isEmpty,
      s"curriculumSchedule: null values in source column '$sourceCol' — " +
        "clean or filter the corpus first")
    val srcs = per.select("source").collect().map(_.getString(0)).sorted
    val k = srcs.length
    val den = (k * (k + 1) / 2).toDouble
    val ranks = docs.sparkSession.createDataFrame(
      srcs.zipWithIndex.toIndexedSeq
        .map { case (s, i) => (s, (k - i).toDouble / den) })
      .toDF("source", "_tgt")
    val tot = per.agg(sum(col("n_docs")).cast("long").as("_nn"))
    val es = docs.sparkSession.range(1, epochs + 1L)
      .select(col("id").as("epoch"))
    val shares = per.join(broadcast(ranks), Seq("source")).crossJoin(tot)
      .withColumn("_nat",
        col("n_docs").cast("double") / col("_nn").cast("double"))
      .crossJoin(broadcast(es))
      .withColumn("_f", col("epoch").cast("double") / lit(epochs.toDouble))
      .withColumn("share",
        col("_nat") + (col("_tgt") - col("_nat")) * col("_f"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("epoch")
    val quotas = shares
      .withColumn("_raw", lit(budget.toDouble) * col("share"))
      .withColumn("_base", floor(col("_raw")))
      .withColumn("_rem", col("_raw") - col("_base"))
      .withColumn("_left", lit(budget) - sum(col("_base")).over(w))
      .withColumn("_rk", row_number().over(
        w.orderBy(desc("_rem"), asc("source"))))
      .withColumn("quota_tokens",
        (col("_base") + when(col("_rk") <= col("_left"), 1L).otherwise(0L))
          .cast("long"))
    quotas.select(col("epoch"), col("source"), col("share"),
        col("quota_tokens"))
      .orderBy("epoch", "source")
  }
}
