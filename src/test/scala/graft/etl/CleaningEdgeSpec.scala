package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge-semantics unit tests (SURVEY.md §5.2.3): null-key dedup, tie-broken
  * mode, garbage timestamps (verbatim from the reference generators),
  * clip/coerce null behavior.
  */
class CleaningEdgeSpec extends SparkSpec {
  import Cleaning._

  private def df(rows: Seq[(java.lang.Double, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("dedupKeepFirst keeps first row in order; null keys collapse to one") {
    val d = df(Seq(
      (1.0, "a"), (1.0, "b"), (null, "n1"), (2.0, "c"), (null, "n2"), (1.0, "d")))
    val out = dedupKeepFirst(d, "k").orderBy("v").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a", "c", "n1"))
  }

  test("dedupKeepFirst falls back to full-row dedup when key absent") {
    val d = df(Seq((1.0, "a"), (1.0, "a"), (2.0, "b")))
    assert(dedupKeepFirst(d.drop("k").withColumnRenamed("v", "x"), "k").count() == 2)
  }

  test("parseMessyTimestamp: all three formats parse, garbage coerces to null") {
    import spark.implicits._
    // garbage values verbatim from generate_traffic_data.py:8-14 /
    // generate_weather_data.py:8-14
    val cases = Seq(
      "2024-03-05 14:00" -> "2024-03-05T14:00",
      "05/03/2024 02PM" -> "2024-03-05T14:00",
      "01/01/2024 12AM" -> "2024-01-01T00:00",
      "2024-03-05T14:00Z" -> "2024-03-05T14:00",
      "TBD" -> null, "2099-00-00 99:99" -> null, "32/13/2025 25:61" -> null,
      "Invalid" -> null, "Unknown" -> null, "2099-13-40 25:61" -> null,
      "32/15/2024 99:99" -> null, "2024-01-15T99:00Z" -> null
    )
    val out = cases.map(_._1).toDF("s")
      .select(parseMessyTimestamp(col("s")).cast("timestamp_ntz").as("ts"))
      .collect()
    cases.zip(out).foreach { case ((in, expected), r) =>
      val got = if (r.isNullAt(0)) null
        else r.getAs[java.time.LocalDateTime](0).toString
      assert(got == expected, s"'$in' parsed to $got, expected $expected")
    }
  }

  test("modes: pandas tie-break to lexicographically smallest") {
    import spark.implicits._
    val d = Seq("b", "b", "a", "a", "c", null).toDF("x")
    assert(modes(d, Seq("x")) == Map("x" -> "a"))
  }

  test("fillCategoricalsWithMode: all-null column falls back to Unknown") {
    import spark.implicits._
    val d = Seq(("x", null: String), ("y", null: String)).toDF("a", "b")
    val out = fillCategoricalsWithMode(d, Seq("b")).select("b").collect()
    assert(out.forall(_.getString(0) == "Unknown"))
  }

  test("clip: nulls stay null, in-range values untouched, outliers clamped") {
    import spark.implicits._
    val d = Seq[java.lang.Double](1.0, 5.0, 100.0, null, -50.0).toDF("x")
      .select(clip(col("x"), 0.0, 10.0).as("c"))
    assert(d.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.0), Some(5.0), Some(10.0), None, Some(0.0)))
  }

  test("coerceToDouble: numeric strings parse, garbage AND 'NaN' become null") {
    import spark.implicits._
    val d = Seq("3057", "3057.5", "NaN", "Unknown", "xxx", null).toDF("x")
      .select(coerceToDouble(col("x")).as("c"))
    assert(d.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(3057.0), Some(3057.5), None, None, None, None))
  }

  test("cleanNumerics >50% null column drops its null rows (sequential path)") {
    import spark.implicits._
    val d = (1 to 10).map(i =>
      (i, if (i <= 6) null else java.lang.Double.valueOf(i.toDouble)))
      .toDF("id", "x")
    val out = cleanNumerics(d, Seq("x"))
    assert(out.count() == 4) // 6 of 10 null → >50% → nulls dropped
    assert(out.filter(col("x").isNull).count() == 0)
  }

  test("asOfJoin: inclusive at equal ts, latest-prior wins, null when none") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // matches right at same ts (inclusive)
      (1L, 11L, ts("2024-01-01 12:00:00")), // matches the latest prior (11:00)
      (2L, 20L, ts("2024-01-01 09:00:00")) // no prior right row → null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 11:00:00")),
      (2L, 200L, ts("2024-01-01 09:30:00"))
    ).toDF("user_id", "rid", "ts")
    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts", Seq("rid"))
      .orderBy("event_id")
      .collect()
    assert(out.map(r => Option(r.getAs[java.lang.Long]("rid_asof"))).toSeq ==
      Seq(Some(100L), Some(101L), None))
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(10L, 11L, 20L))
  }

  test("suffixedJoin: pandas-style collision suffixes, keys unsuffixed") {
    import spark.implicits._
    val l = Seq((1, "x", 10)).toDF("k", "shared", "lonly")
    val r = Seq((1, "y", 20)).toDF("k", "shared", "ronly")
    val j = Joins.suffixedJoin(l, r, Seq("k"), "left", ("_a", "_b"))
    assert(j.columns.toSet == Set("k", "shared_a", "lonly", "shared_b", "ronly"))
  }
}
