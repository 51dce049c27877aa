package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampType}

/** Reusable cleaning operators.
  *
  * Semantics mirror the reference's pandas cleaning stages
  * (python-service/scripts/clean_traffic.py:41-148, clean_weather.py:25-109)
  * but each stat pass is fused into a single multi-aggregate scan instead of
  * pandas' one-scan-per-statistic loop — at 100 TB the difference is ~4 scans
  * vs ~20.
  *
  * Order is part of the semantics (SURVEY.md §3 E2): dedup happens before the
  * timestamp drop; IQR bounds are computed on the post-drop pre-clip column;
  * the median fill uses the post-clip column.
  */
object Cleaning {

  /** Name of the injected file-order column (used for keep-first dedup). */
  val SrcOrder = "_src_order"

  /** pandas keeps implicit row order; Spark needs it materialized.
    *
    * For a file-backed frame the order key is the struct
    * `(_metadata.file_path, _metadata.file_block_start, mid)`, compared
    * lexicographically:
    *  - `file_path` orders files the way `pd.concat(sorted(glob))` does —
    *    Spark's scan bin-packs files by SIZE, so partition order is not
    *    file order and bare `monotonically_increasing_id` is wrong on any
    *    multi-file bronze;
    *  - `file_block_start` orders the splits of one large file by byte
    *    offset;
    *  - `monotonically_increasing_id` breaks ties WITHIN a block: one
    *    block is read by exactly one task in one sequential pass, so ids
    *    are monotone in row order there (their cross-partition values
    *    never matter — the file/block prefix dominates).
    * Works for every file format (CSV has no `_metadata.row_index`, but
    * path/block_start are universal). Frames with no file lineage (joins,
    * aggregates, in-memory test data) fall back to bare
    * `monotonically_increasing_id`, which follows scan order only for a
    * single input partition — carry an explicit order column
    * (`dedupKeepFirstBy`, as q49 does) when that's not enough.
    */
  def withSrcOrder(df: DataFrame): DataFrame =
    if (df.columns.contains(SrcOrder)) df
    else scala.util.Try {
      df.withColumn(SrcOrder, struct(
        col("_metadata.file_path"),
        col("_metadata.file_block_start"),
        monotonically_increasing_id()))
    }.getOrElse(df.withColumn(SrcOrder, monotonically_increasing_id()))

  /** D1/D2: `drop_duplicates(subset=key)` with pandas semantics — keep the
    * FIRST row in file order; null keys compare equal (one survivor).
    * Spark's `dropDuplicates` keeps an arbitrary row, so we use an explicit
    * keep-first window over the source order. See `withSrcOrder` for the
    * single-file ordering assumption; use `dedupKeepFirstBy` when an
    * explicit order column exists.
    * (reference: clean_traffic.py:66-72, clean_weather.py:43-46)
    */
  def dedupKeepFirst(df: DataFrame, key: String): DataFrame =
    if (!df.columns.contains(key)) df.dropDuplicates() // D3 fallback, clean_traffic.py:70-71
    else dedupKeepFirstBy(withSrcOrder(df), key, SrcOrder)

  /** Keep-first dedup with an EXPLICIT order column — the multi-file-safe
    * variant (ingest-time sequence numbers, timestamps, …).
    */
  def dedupKeepFirstBy(df: DataFrame, key: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  /** The three timestamp formats the bronze generators emit
    * (generate_traffic_data.py:17-24, generate_weather_data.py:7-24).
    */
  val DefaultTimestampFormats: Seq[String] =
    Seq("yyyy-MM-dd HH:mm", "dd/MM/yyyy hha", "yyyy-MM-dd'T'HH:mm'Z'")

  /** C1: `pd.to_datetime(errors="coerce", dayfirst=True, utc=True)` analog.
    * Each format is tried in turn; anything unparseable coerces to null
    * (ANSI off). `dayfirst` is subsumed by the explicit dd/MM pattern; the
    * formats are mutually unambiguous so the coalesce order is safe.
    * (reference: clean_traffic.py:76-86, clean_weather.py:49-53)
    */
  def parseMessyTimestamp(
      c: Column,
      formats: Seq[String] = DefaultTimestampFormats
  ): Column =
    coalesce(formats.map(f => to_timestamp(c, f)): _*)

  /** All numeric-typed column names, in schema order — the
    * `select_dtypes(include=[np.number])` idiom
    * (factor_analysis.py:178, monte_carlo.py:260).
    */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  /** A1: per-column mode with the pandas tie-break (lexicographically
    * smallest among the most frequent; nulls excluded). All requested columns
    * are computed in ONE shuffled pass via melt → count → per-column top-1,
    * instead of a scan per column. The melt multiplies rows × |cols| before
    * the map-side partial count collapses them — the right trade for the
    * handful of categorical columns this serves; for wide frames (hundreds
    * of columns) run per-column `mode_det` aggregates instead
    * (graft.functions.DeterministicMode — one pass, no row multiplication).
    * (reference: clean_traffic.py:89-95, clean_weather.py:56-64)
    */
  def modes(df: DataFrame, cols: Seq[String]): Map[String, String] = {
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) return Map.empty
    val kvs = present.map(c =>
      struct(lit(c).as("c"), col(c).cast(StringType).as("v"))
    )
    val counts = df
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.c").as("c"), col("kv.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("c", "v")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("c").orderBy(desc("cnt"), asc("v"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c", "v")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }

  /** A1+C5: fill null categoricals with the column mode (fallback "Unknown"
    * when a column is entirely null — `mode_val.empty` branch).
    */
  def fillCategoricalsWithMode(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) return df
    val m = modes(df, present)
    present.foldLeft(df) { (d, c) =>
      d.na.fill(Map(c -> m.getOrElse(c, "Unknown")))
    }
  }

  /** C3→P3→A3→C4→A2/C5 numeric pipeline for a set of columns:
    * coerce to double; drop null rows if a column is >50% null; clip to
    * [Q1−1.5·IQR, Q3+1.5·IQR] (exact quantiles, linear interpolation — same
    * definition as pandas); median-fill the post-clip column.
    *
    * The common case (no column exceeds the 50% null threshold, which never
    * fires on the reference's ~5%-null generators) runs in exactly THREE
    * scans regardless of column count: null-fractions, all Q1/Q3s, all
    * post-clip medians. If a drop does fire we fall back to strictly
    * sequential per-column processing, because a row drop changes every
    * later column's quantiles (pandas processes columns in order).
    * (reference: clean_traffic.py:101-131, clean_weather.py:66-91)
    */
  def cleanNumerics(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) return df
    // LAZY checkpoint (r11): the numeric stage is inherently multi-pass
    // (null fractions, Q1/Q3, post-clip medians, then the consumer), and
    // the upstream clean lineage (keep-first window, multi-format
    // timestamp parse) re-executed on every pass. The first aggregate
    // materializes the frame into spillable executor storage; every later
    // pass reads the cache. At true lake scale the medallion pipeline
    // persists this stage as parquet anyway (Pipeline.scala), so the
    // in-memory cache only ever holds interactive-sized tables.
    val coerced = present.foldLeft(df)((d, c) =>
      d.withColumn(c, coerceToDouble(col(c)))
    ).localCheckpoint(false)
    val fracRow = coerced
      .agg(
        avg(col(present.head).isNull.cast("double")).as("f0"),
        present.tail.map(c => avg(col(c).isNull.cast("double"))): _*
      )
      .head()
    val nullFrac = present.indices.map(i =>
      present(i) -> (if (fracRow.isNullAt(i)) 0.0 else fracRow.getDouble(i))
    ).toMap // avg over an empty frame is null → treat as no nulls
    if (present.exists(c => nullFrac(c) > 0.5))
      present.foldLeft(coerced)(cleanOneNumericSequential)
    else cleanNumericsFused(coerced, present)
  }

  private def cleanNumericsFused(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Q1 & Q3 via the shared histogram-refinement helper (r11) — values
    // bit-identical to the single-buffer percentile aggregate, without its
    // one-reduce-task merge of every distinct value of every column.
    // Columns are NaN-free here by construction (coerceToDouble nulls NaN).
    val q13 = graft.analytics.Summary.exactPercentilesHist(
      df, cols.map(c => c -> Seq(0.25, 0.75)))
    val clipped = cols.foldLeft(df) { case (d, c) =>
      q13(c).head match {
        case None => d // all-null column: pandas clip(NaN, NaN) is a no-op
        case Some(q1) =>
          val q3 = q13(c)(1).get
          val iqr = q3 - q1
          d.withColumn(c, clip(col(c), q1 - 1.5 * iqr, q3 + 1.5 * iqr))
      }
    }
    // median of every post-clip column
    val med = graft.analytics.Summary.exactPercentilesHist(
      clipped, cols.map(c => c -> Seq(0.5)))
    cols.foldLeft(clipped) { case (d, c) =>
      med(c).head match {
        case None => d
        case Some(m) => d.na.fill(Map(c -> m))
      }
    }
  }

  private def cleanOneNumericSequential(df: DataFrame, c: String): DataFrame = {
    val fracRow = df.agg(avg(col(c).isNull.cast("double"))).head()
    val frac = if (fracRow.isNullAt(0)) 0.0 else fracRow.getDouble(0)
    val dropped = if (frac > 0.5) df.na.drop(Seq(c)) else df
    val q13 = graft.analytics.Summary.exactPercentilesHist(
      dropped, Seq(c -> Seq(0.25, 0.75)))(c)
    val clipped = q13.head match {
      case None => dropped
      case Some(q1) =>
        val q3 = q13(1).get
        val iqr = q3 - q1
        dropped.withColumn(c, clip(col(c), q1 - 1.5 * iqr, q3 + 1.5 * iqr))
    }
    val med = graft.analytics.Summary.exactPercentilesHist(
      clipped, Seq(c -> Seq(0.5)))(c).head
    med match {
      case None => clipped
      case Some(m) => clipped.na.fill(Map(c -> m))
    }
  }

  /** C3: `pd.to_numeric(errors='coerce')` analog. Plain `cast` almost
    * matches (garbage → null under non-ANSI), EXCEPT the string "NaN", which
    * Spark casts to the NaN VALUE while pandas treats it as missing — and a
    * NaN would poison quantiles/clip/fill downstream. Null it out.
    */
  def coerceToDouble(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d), lit(null).cast("double")).otherwise(d)
  }

  /** C4: pandas `Series.clip(lo, hi)` — nulls stay null (Spark's
    * least/greatest skip nulls, so the null case must be guarded explicitly).
    */
  def clip(c: Column, lo: Double, hi: Double): Column =
    when(c.isNull, lit(null).cast("double"))
      .otherwise(least(greatest(c, lit(lo)), lit(hi)))

  /** Column-level config for a clean stage. */
  final case class CleanConfig(
      keyCol: String,
      timestampCol: String,
      categoricalCols: Seq[String],
      numericCols: Seq[String]
  )

  /** Full clean stage (E2 trace, SURVEY.md §3): dedup-keep-first → parse
    * timestamps & drop unparseable → mode-fill categoricals → numeric
    * coerce/clip/fill. The intermediate (post-drop) frame is cached because
    * the stat passes scan it repeatedly.
    */
  def clean(raw: DataFrame, cfg: CleanConfig): DataFrame = {
    val deduped = dedupKeepFirst(withSrcOrder(raw), cfg.keyCol)
    val parsed =
      if (
        deduped.schema.fields
          .exists(f => f.name == cfg.timestampCol && f.dataType == TimestampType)
      ) deduped
      else
        deduped.withColumn(
          cfg.timestampCol,
          parseMessyTimestamp(col(cfg.timestampCol))
        )
    val dated = parsed.filter(col(cfg.timestampCol).isNotNull).cache()
    try {
      val catFilled = fillCategoricalsWithMode(dated, cfg.categoricalCols)
      cleanNumerics(catFilled, cfg.numericCols).drop(SrcOrder)
    } finally {
      // lazily unpersisted; blocking=false keeps the returned plan usable
      dated.unpersist(false)
      ()
    }
  }
}
