package graft.etl

import graft.SparkSpec
import graft.gen.Generators
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of the clean stage (SURVEY.md §5.2.4), driven
  * by the seeded messy generators (S10). ScalaCheck Gen supplies the random
  * seeds/sizes (sampled explicitly — the scalatest bridge artifact isn't in
  * the offline cache).
  */
class CleaningPropertiesSpec extends SparkSpec {

  private def samples(g: Gen[Long], n: Int): Seq[Long] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val seeds = samples(Gen.choose(1L, 10000L), 3)

  test("clean traffic invariants hold for generated messy inputs") {
    seeds.foreach { seed =>
      val raw = Generators.traffic(spark, 800, seed)
      val out = CleanTraffic(raw).cache()
      try {
        assert(out.filter(col("date_time").isNull).count() == 0)
        CleanTraffic.config.categoricalCols.foreach { c =>
          assert(out.filter(col(c).isNull).count() == 0, s"$c has nulls (seed $seed)")
        }
        CleanTraffic.config.numericCols.foreach { c =>
          assert(out.filter(col(c).isNull).count() == 0, s"$c has nulls (seed $seed)")
        }
        // dedup idempotent on the cleaned output
        val ids = out.select("traffic_id")
        assert(Cleaning.dedupKeepFirst(ids, "traffic_id").count() ==
          ids.dropDuplicates("traffic_id").count())
        assert(out.count() <= 800)
      } finally { out.unpersist(); () }
    }
  }

  test("weather numerics lie within the clip fences of the pre-clip column") {
    seeds.foreach { seed =>
      val raw = Generators.weather(spark, 600, seed)
      // reconstruct the pipeline state where the fences are computed:
      // dedup → parse/drop dates → coerce numerics (pre-clip, pre-fill)
      val pre = Cleaning
        .dedupKeepFirst(Cleaning.withSrcOrder(raw), "weather_id")
        .withColumn("date_time", Cleaning.parseMessyTimestamp(col("date_time")))
        .filter(col("date_time").isNotNull)
      val out = CleanWeather(raw)
      CleanWeather.config.numericCols.foreach { c =>
        val q = pre.agg(
          percentile(Cleaning.coerceToDouble(col(c)), lit(0.25)),
          percentile(Cleaning.coerceToDouble(col(c)), lit(0.75))).head()
        if (!q.isNullAt(0)) {
          val iqr = q.getDouble(1) - q.getDouble(0)
          val (lo, hi) = (q.getDouble(0) - 1.5 * iqr, q.getDouble(1) + 1.5 * iqr)
          val mm = out.agg(min(col(c)), max(col(c))).head()
          assert(mm.getDouble(0) >= lo - 1e-6 && mm.getDouble(1) <= hi + 1e-6,
            s"$c [${mm.getDouble(0)}, ${mm.getDouble(1)}] outside fence [$lo, $hi] (seed $seed)")
        }
      }
    }
  }

  test("merge preserves left rows: every traffic id appears at least once") {
    seeds.foreach { seed =>
      val t = CleanTraffic(Generators.traffic(spark, 400, seed))
      val w = CleanWeather(Generators.weather(spark, 400, seed + 1))
      val m = MergeTrafficWeather(t, w)
      assert(m.select("traffic_id").distinct().count() ==
        t.select("traffic_id").distinct().count(),
        s"left preservation failed (seed $seed)")
    }
  }

  test("generators reproduce the documented mess profile") {
    val t = Generators.traffic(spark, 2000, 11).cache()
    try {
      assert(t.count() == 2000)
      val nullCity = t.filter(col("city").isNull).count().toDouble / 2000
      assert(nullCity > 0.4 && nullCity < 0.6, s"city null frac $nullCity")
      val parsed = t.select(
        Cleaning.parseMessyTimestamp(col("date_time")).as("ts"))
      val badFrac = parsed.filter(col("ts").isNull).count().toDouble / 2000
      assert(badFrac > 0.04 && badFrac < 0.11, s"bad ts frac $badFrac")
      assert(t.count() - t.dropDuplicates("traffic_id").count() > 0)
    } finally { t.unpersist(); () }
  }
}
