package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The lake-persisted artifact layer: producers persist to a content-
  * addressed parquet path; a cold-start consumer (fresh session registry)
  * reads the artifact instead of re-deriving (the q140 → q143/q200
  * composition).
  */
class MaterializedSpec extends SparkSpec {

  // unique per test-run so stale artifacts from earlier runs can't satisfy
  // the build-path assertions
  private val run = System.nanoTime().toString

  test("putPersistent commits a lake artifact; an evicted (cold-start) " +
    "consumer reads it back value-identical without building") {
    val parts = Seq("materialized-spec", run, "case1")
    val src = spark.range(0, 1000)
      .select(col("id"), (col("id") * 3).as("v"),
        concat(lit("s"), col("id")).as("s"))
    Materialized.putPersistent(spark, parts, src)
    // cold start: forget the session registry entry
    Materialized.evict(Materialized.key(spark, parts: _*))
    val got = Materialized.getOrBuildPersistent(spark, parts) {
      fail("consumer re-derived despite a committed lake artifact")
    }
    assert(got.count() == 1000)
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
  }

  test("getOrBuildPersistent with no artifact builds AND persists, so the " +
    "NEXT cold start reads") {
    val parts = Seq("materialized-spec", run, "case2")
    var built = 0
    def build = { built += 1; spark.range(0, 10).selectExpr("id", "id*2 AS d") }
    val first = Materialized.getOrBuildPersistent(spark, parts)(build)
    assert(first.count() == 10 && built == 1)
    Materialized.evict(Materialized.key(spark, parts: _*))
    val second = Materialized.getOrBuildPersistent(spark, parts)(build)
    assert(second.count() == 10)
    assert(built == 1, "second cold start re-derived instead of reading")
  }

  test("putPersistent always rebuilds over an existing artifact " +
    "(producer honesty): the replacement is what consumers read") {
    val parts = Seq("materialized-spec", run, "case3")
    Materialized.putPersistent(spark, parts,
      spark.range(0, 5).selectExpr("id AS k"))
    Materialized.putPersistent(spark, parts,
      spark.range(100, 110).selectExpr("id AS k"))
    Materialized.evict(Materialized.key(spark, parts: _*))
    val got = Materialized.getOrBuildPersistent(spark, parts) {
      fail("artifact missing after second put")
    }
    assert(got.agg(min(col("k")), max(col("k"))).head() ==
      org.apache.spark.sql.Row(100L, 109L))
  }
}
