package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Medallion-layer IO.
  *
  * The reference moves bytes by hand through a MinIO SDK + WebHDFS client
  * (clean_traffic.py:59-60,135-146; copy_to_hdfs.py:109-142). On Spark all of
  * that collapses into path-based reads/writes: `s3a://bucket/...`,
  * `hdfs://nn/...` and `file:/...` are interchangeable URIs handled by the
  * Hadoop FS layer, so one code path covers local dev and the 100-TB cluster.
  */
final case class LakePaths(root: String) {
  def bronze(name: String): String = s"$root/bronze/$name"
  def silver(name: String): String = s"$root/silver/$name"
  def gold(name: String): String = s"$root/gold/$name"
}

object Layers {

  /** CSV scan with a declared schema (S1). Never `inferSchema`: the bronze
    * tables contain mixed-type columns that sampling would mis-infer
    * (FIXTURES.md §A, generate_weather_data.py:133-142).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Parquet scan (S2). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Parquet sink (S4/S5). Replaces the reference's write-local-then-upload
    * double hop (clean_traffic.py:135-146) with a single distributed write.
    * `partitionBy` is the 100-TB layout knob (date-partitioned silver/gold
    * enables dynamic partition pruning downstream).
    */
  def writeParquet(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Nil
  ): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Date-partitioned parquet sink — the 100-TB layout for silver/gold:
    * one directory per calendar day of `tsCol`, so day-grain predicates
    * (e.g. the merge stage's join key) prune partitions at the source and
    * dynamic partition pruning kicks in for joins against a date dimension.
    *
    * Rows are CLUSTERED BY DAY before the write (r8): without it, every
    * one of the N write tasks emits a sliver into every day directory —
    * N×days small files, the exact problem compaction exists for.
    * `filesPerDay` is the big-day knob: 1 (default) = one file per day;
    * at 100 TB a single day outgrows one task, so raise it and rows
    * additionally spread over `filesPerDay` deterministic sub-buckets
    * (xxhash64 of the row — content-stable across retries).
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String,
      filesPerDay: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, to_date, xxhash64}
    require(filesPerDay >= 1, "filesPerDay >= 1")
    val withDay = df.withColumn("_p_date", to_date(col(tsCol)).cast("string"))
    val clustered =
      if (filesPerDay == 1) withDay.repartition(col("_p_date"))
      else withDay.repartition(col("_p_date"),
        pmod(xxhash64(df.columns.map(col): _*), lit(filesPerDay.toLong)))
    clustered.write.mode("overwrite").partitionBy("_p_date").parquet(path)
  }

  /** Bucketed + sorted table layout — the co-located-join knob at 100 TB.
    * Rows are hash-distributed by `keys` into `nBuckets` bucket files, each
    * sorted by `sortCols` (default: the keys). Aggregations, joins, and
    * windows keyed on the bucket columns then run WITHOUT an exchange (and,
    * when `sortCols` covers the required ordering, without a sort): the
    * shuffle is paid ONCE at write time and amortized over every downstream
    * query — e.g. bucket a document lake by content hash and keep-first
    * dedup becomes a scan-local window (PlanSpec asserts the zero-exchange
    * plans). Bucket metadata lives in the catalog, not the directory, hence
    * `saveAsTable`; set `spark.sql.warehouse.dir` (SPARK_GRAFT_WAREHOUSE)
    * to place the files.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val sort = if (sortCols.isEmpty) keys else sortCols
    // Cluster rows by the bucket keys BEFORE writing: bucketBy assigns
    // files with the SAME HashPartitioning the repartition uses, so each
    // bucket lands in exactly ONE file. Without this, every writing task
    // emits a sliver per bucket (tasks × buckets files) and the read side
    // DISCARDS the sortBy metadata (a bucket is only "sorted" when it is
    // a single file) — the r8 layout probe's bucketed join then re-sorted
    // the whole fact per query and LOST wall-clock to the plain join
    // (5.05 vs 4.71 s at 100×) despite eliminating its exchanges. The
    // write-time shuffle this adds is the "paid once" cost the layout
    // already claims; reads get one file per bucket + a sort-free SMJ.
    df.repartition(nBuckets, keys.map(col): _*)
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .saveAsTable(table)
  }

  /** CSV sink (S3). `header=true, no index` matches `to_csv(index=False)`
    * (generate_traffic_data.py:131).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** ORC sink/scan — the other columnar lake format Spark ships a native
    * vectorized reader for; same pushdown/pruning behavior as parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines sink/scan (the interchange format of most text-corpus
    * releases). Reads with an EXPLICIT schema — inferSchema over JSON is
    * a full extra pass and type-unstable, the same rule as S1's CSV scan.
    * `codec` (gzip/bzip2/zstd/none) matches how corpus releases actually
    * ship (.jsonl.gz); the scan decompresses transparently by extension.
    * Note gzip is NOT splittable — one file = one task at read time, so
    * compressed corpora rely on MANY files for parallelism (the writer's
    * partition count is the read-side parallelism knob).
    */
  def writeJsonl(df: DataFrame, path: String,
      codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Catalog listing (S9): parquet objects under a directory. */
  def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf(spark))
    if (!fs.exists(p)) Seq.empty
    else
      fs.globStatus(new Path(p, "*.parquet"))
        .toSeq
        .map(_.getPath.toString)
  }

  /** Cross-filesystem copy (S6/S7 analog): local→s3a, s3a→hdfs, etc. The
    * reference streams each object through the driver over WebHDFS
    * (copy_to_hdfs.py:109-142); `FileUtil.copy` does the same through the
    * Hadoop FS API and works for any scheme pair.
    */
  def copy(spark: SparkSession, from: String, to: String): Boolean = {
    val conf = hadoopConf(spark)
    val src = new Path(from)
    val dst = new Path(to)
    val srcFs = src.getFileSystem(conf)
    val dstFs = dst.getFileSystem(conf)
    FileUtil.copy(srcFs, src, dstFs, dst, false, true, conf)
  }

  /** Layer/bucket DDL analog (S8): mkdir -p on any Hadoop FS. */
  def ensure(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf(spark))
    if (!fs.exists(p)) { fs.mkdirs(p); () }
  }

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration
}
