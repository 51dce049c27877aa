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

  test("every None-oracle query names its reason (no_oracle budget guard)") {
    val rowsOnly = SparkEntry.all.collect {
      case QueryDef(n, _, None) => n
    }.toSet
    val unexplained = rowsOnly -- SparkEntry.noOracleReasons.keySet
    assert(unexplained.isEmpty,
      s"rows-only queries without a registered reason: $unexplained — " +
        "add them to SparkEntry.noOracleReasons or give them an oracle")
    val stale = SparkEntry.noOracleReasons.keySet -- rowsOnly
    assert(stale.isEmpty,
      s"noOracleReasons entries for queries that are gone or now oracled: $stale")
    val legal = Set("hash-seeded", "stochastic", "driver-ML", "binary")
    SparkEntry.noOracleReasons.foreach { case (n, reason) =>
      assert(legal.exists(reason.startsWith),
        s"$n: reason must start with one of $legal, got '$reason'")
    }
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val n = q.fn(spark, sfDir("0.001")).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
