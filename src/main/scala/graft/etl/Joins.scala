package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join helpers with pandas-compatible collision handling. */
object Joins {

  /** pandas `pd.merge(left, right, on=keys, suffixes=(ls, rs))` semantics:
    * join-key columns appear once; every OTHER name collision gets the
    * respective suffix. Spark does not auto-suffix, so collisions are renamed
    * pre-join (which also keeps the plan free of ambiguous references).
    * (reference: merge.py:71-77)
    */
  def suffixedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "left",
      suffixes: (String, String) = ("_x", "_y")
  ): DataFrame = {
    val collisions =
      (left.columns.toSet intersect right.columns.toSet) -- on.toSet
    val l = collisions.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, c + suffixes._1)
    )
    val r = collisions.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, c + suffixes._2)
    )
    l.join(r, on, how)
  }

  /** As-of join: for each left row, attach the MOST RECENT right row with
    * `right.ts <= left.ts` within the same key — the temporal-enrichment
    * operator Spark's built-ins lack (and a range join would explode).
    *
    * Implemented the scale-friendly way: union both sides, one shuffle on
    * the key, sort by (ts, side) within key, and carry the latest right
    * values forward with `last_value(ignoreNulls)` — O(n log n) per key,
    * no pairwise range comparison. Right rows sort before left rows at
    * equal timestamps, so the match is inclusive. Right value columns come
    * back suffixed; unmatched left rows keep nulls (left-join semantics).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String],
      suffix: String = "_asof"
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .select(keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(c + suffix)): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select(keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(c => col(c).as(c + suffix)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = rightValueCols.foldLeft(l.unionByName(r)) { (d, c) =>
      d.withColumn(c + suffix,
        last(col(c + suffix), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .drop("_side", "_ts") // original left tsCol is still among leftCols
      .select(leftCols.map(col) ++ rightValueCols.map(c => col(c + suffix)): _*)
  }

  /** Skew-busting salted join: the (skewed) left side gets a salt in
    * [0, salts); the right side is replicated once per salt value, so a hot
    * key's rows spread over `salts` reducers instead of one. Semantics are
    * identical to `left.join(right, on, how)` for how ∈ {inner, left} as
    * long as `on` is unique on the right (each left row still matches each
    * right row exactly once). AQE's skew-join split handles moderate skew
    * at runtime; salting is the static fallback for the pathological keys
    * (e.g. the merge stage's constant `city` at lake scale).
    *
    * The salt is DETERMINISTIC — xxhash64 of the left row, mod salts —
    * not `rand(seed)`: rand's stream depends on the input partitioning, so
    * retries, speculative tasks, or an upstream repartition could re-deal
    * the salts mid-job; the hash salt is a pure function of the data.
    *
    * Pass `uniqueCol` (a row-unique left column, e.g. the table's id) when
    * one exists: it disambiguates BYTE-IDENTICAL duplicate rows — the
    * classic hot-key shape, e.g. many identical events for one user — which
    * otherwise all hash to the same sub-key and defeat the spread. It also
    * sidesteps column types hash functions reject (e.g. map). Without it,
    * identical-duplicate rows do not spread; AQE's skew-join split (enabled
    * in GraftSession) remains the runtime mitigation for that shape.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      salts: Int = 16,
      uniqueCol: Option[String] = None
  ): DataFrame = {
    require(how == "inner" || how == "left", s"saltedJoin: unsupported $how")
    require(salts > 1, "salts must spread over at least 2 sub-keys")
    val saltSrc: Seq[org.apache.spark.sql.Column] = uniqueCol match {
      case Some(c) => Seq(col(c))
      case None => left.columns.map(col).toSeq
    }
    val l = left.withColumn("_graft_salt",
      pmod(xxhash64(saltSrc: _*), lit(salts.toLong)))
    val r = right.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, on :+ "_graft_salt", how).drop("_graft_salt")
  }

  /** FACT-SIDE DICTIONARY ENCODING dial (VERDICT r5 #8): map a LOW-
    * cardinality wide string column to int codes before it crosses
    * shuffles, with the inverse map for late re-materialization — the
    * classic network-bound-cluster trade (shuffle 4-byte codes, decode
    * after the wide exchanges).
    *
    * MEASURED AND REJECTED as a default on local[32]: the naive form —
    * `broadcast(df.select(c).distinct())` joined back — RE-EVALUATES the
    * whole fact subtree once per consumer (encode join + decode join = 2+
    * full distinct scans; q187 went 25 → 45 s, r5 notes). This helper
    * therefore builds the dictionary DRIVER-SIDE with ONE bounded
    * distinct-collect and ships both directions as map literals:
    * encode/decode are then pure scan-side expressions with zero extra
    * scans or joins. On localhost shuffles the byte saving is noise;
    * over a real network it is the point — flip it per column without
    * re-deriving the trap.
    *
    * Deterministic codes (values sorted), null ↔ null through the map
    * lookups; refuses cardinalities above `maxCardinality` (the literal
    * map must stay a sane broadcast size). Returns the encoded frame and
    * the decode expression to apply AFTER the wide stages
    * (DialsSpec pins end-to-end value identity both ways).
    */
  def dictEncodeColumn(
      df: DataFrame,
      c: String,
      maxCardinality: Int = 65536
  ): (DataFrame, org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val values = df.select(c).distinct().limit(maxCardinality + 1)
      .collect().map(r => Option(r.getString(0)))
    require(values.length <= maxCardinality,
      s"dictEncodeColumn($c): cardinality exceeds $maxCardinality")
    val sorted = values.flatten.sorted
    val toCode = typedLit(sorted.zipWithIndex.toMap)
    val fromCode = typedLit(sorted.zipWithIndex.map(_.swap).toMap)
    (df.withColumn(c, element_at(toCode, col(c))),
      code => element_at(fromCode, code))
  }

  /** Point-in-interval join (`lo <= point <= hi`) WITHOUT a cartesian:
    * Spark has no native range-join optimization, and a plain non-equi
    * condition plans as BroadcastNestedLoop / cartesian — O(|points|·|intervals|)
    * comparisons. Bucket expansion turns it into an EQUI-join: each
    * interval explodes to the `bucketWidth`-sized buckets it covers, each
    * point hashes to its single bucket, and the exact containment filter
    * runs only on bucket-colocated candidates. A matching pair meets in
    * exactly ONE bucket (the point's), so no dedup pass is needed.
    *
    * Pick `bucketWidth` near the typical interval length: explosion factor
    * is `len/width + 1` per interval, and candidate density per bucket is
    * what the filter pays for. Point/interval columns must be integral
    * (cast timestamps to epoch units first); the two frames' column names
    * must be disjoint.
    */
  def intervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "intervalJoin: point/interval column names must be disjoint")
    val p = points.withColumn("_graft_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("_graft_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("_graft_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_graft_bucket")
  }
}

/** Silver stage: traffic ⋈ weather on (city, calendar day).
  * Mirrors python-service/scripts/merge.py:63-80. The day-grain key fans
  * hourly rows out many-to-many (101,892 rows from 4,595×4,625 at reference
  * scale).
  *
  * Scale notes: both sides at reference scale are tiny → Catalyst broadcasts
  * automatically. At 100 TB the (city, date) key is heavily skewed (mode-fill
  * makes `city` a constant) — AQE skew-join splitting is enabled in
  * GraftSession for exactly this shape; for a deliberately partitioned lake,
  * write both silver tables bucketed/partitioned by date so the join is
  * co-located.
  */
object MergeTrafficWeather {

  /** Output column order fixed to the pandas result (FIXTURES.md §A). */
  val outputColumns: Seq[String] = Seq(
    "traffic_id", "date_time_traffic", "city", "area", "vehicle_count",
    "avg_speed_kmh", "accident_count", "congestion_level", "road_condition",
    "visibility_m_traffic", "weather_id", "date_time_weather", "season",
    "temperature_c", "humidity", "rain_mm", "wind_speed_kmh",
    "visibility_m_weather", "weather_condition"
  )

  def apply(traffic: DataFrame, weather: DataFrame): DataFrame = {
    // reuse a MATERIALIZED date_only when the caller provides one (the
    // bucketed silver layout stores it so the join key matches the bucket
    // spec exactly — a derived to_date() expression would not, and the
    // exchange-free plan would be lost)
    def withDay(df: DataFrame): DataFrame =
      if (df.columns.contains("date_only")) df
      else df.withColumn("date_only", to_date(col("date_time")))
    val t = withDay(traffic)
    val w = withDay(weather)
    Joins
      .suffixedJoin(t, w, on = Seq("city", "date_only"), how = "left",
        suffixes = ("_traffic", "_weather"))
      .drop("date_only")
      .select(outputColumns.map(col): _*)
  }

  /** Script-per-stage CLI (merge.py analog): args = lake root. */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("data")
    val spark = graft.GraftSession.quiet(
      graft.GraftSession.local("graft-merge"))
    val lake = graft.io.LakePaths(root)
    val t = graft.io.Layers.readParquet(spark, lake.silver("traffic_clean.parquet"))
    val w = graft.io.Layers.readParquet(spark, lake.silver("weather_clean.parquet"))
    graft.io.Layers.writeParquet(apply(t, w), lake.silver("merged_data.parquet"))
    spark.stop()
  }
}
