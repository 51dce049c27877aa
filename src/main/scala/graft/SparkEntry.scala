package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY.md §2 + the training-data
  * extensions), one entry per operator family; `oracleSql` carries the
  * DuckDB twin for every SQL-expressible entry (stochastic / hash-seeded
  * operators are rows-only by design).
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    CoreQueries.defs ++ TextQueries.defs ++ SimilarityQueries.defs ++
      EventQueries.defs ++ StatQueries.defs ++ CurationQueries.defs ++
      LakeQueries.defs ++ BehaviorQueries.defs ++ SketchQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_regional_revenue")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap

  /** Why each rows-only query carries no DuckDB oracle. EVERY `None`-oracle
    * entry in `all` MUST appear here with its reason (SparkEntrySpec fails
    * on an unexplained one and on stale entries), so unverified work can
    * never hide in the rows-only bucket. Legal reasons:
    *  - `hash-seeded`: depends on engine-side xxhash64/seeded randomness no
    *    other engine reproduces; a portable deterministic twin hash-checks
    *    the same code path (named in parentheses);
    *  - `stochastic`: sampled/iterative ML whose exact output is seed- and
    *    schedule-dependent; a deterministic twin covers the distributed part;
    *  - `driver-ML`: output of an iterative driver-side fit (KMeans/EM);
    *    the distributed data path has a hash-checked twin.
    *
    * EMPTY since r6: every registered query carries a DuckDB oracle — the
    * stochastic/hash-seeded operators were re-registered in portable form
    * (VERDICT r5 #1/#2) with their seeded production forms kept as
    * ScaleCheck x-channels (x25/x26/x40/x41/x42/x46/x53/x54/x74).
    */
  val noOracleReasons: Map[String, String] = Map.empty
}
