package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs at sf0.001 and yields rows; oracle VALUE
  * parity is covered by scripts/check_oracle.py (and the driver itself).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry also works in a vanilla ANSI-on session (driver smoke shape)") {
    val vanilla = spark.newSession()
    vanilla.conf.set("spark.sql.ansi.enabled", "true")
    assert(SparkEntry.entry(vanilla).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val n = q.fn(spark, sfDir("0.001")).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
