package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FeaturePrepSpec extends SparkSpec {
  import spark.implicits._

  test("equalFreqBins: near-equal bin sizes, ordered disjoint ranges") {
    val df = (1 to 1000).map(i => (i.toDouble, (i % 7).toDouble))
      .toDF("v", "tgt")
    val bins = FeaturePrep.equalFreqBins(df, "v", "tgt", 10).collect()
    assert(bins.length == 10)
    assert(bins.map(_.getLong(1)).sum == 1000L)
    // equal-frequency: every decile of 1..1000 holds exactly 100 values
    assert(bins.forall(_.getLong(1) == 100L))
    // ranges are ordered and disjoint
    val los = bins.map(_.getDouble(2)); val his = bins.map(_.getDouble(3))
    assert(los.zip(his).forall { case (l, h) => l <= h })
    assert(his.init.zip(los.tail).forall { case (h, l) => h < l })
  }

  test("targetEncodeM: encoding shrinks the raw mean toward the global mean") {
    val df = Seq(("a", 10.0), ("a", 12.0), ("b", 100.0),
      ("b", 90.0), ("b", 110.0), ("c", 50.0)).toDF("cat", "y")
    val out = FeaturePrep.targetEncodeM(df, "cat", "y", m = 2.0)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val mu = out("a")._4
    for ((_, (_, _, raw, g, enc)) <- out) {
      assert(g == mu)
      // enc lies strictly between raw and global mean (or equals both)
      assert((enc - raw) * (enc - mu) <= 1e-9)
    }
    // heavier group shrinks less, relative to its distance from the mean
    val a = out("a"); val c = out("c")
    assert(math.abs(a._5 - a._3) / math.abs(a._3 - mu) <
      math.abs(c._5 - c._3) / math.abs(c._3 - mu))
  }

  test("ksDrift: identical samples give 0, disjoint samples give 1") {
    val same = (1 to 100).flatMap(i =>
      Seq(("g", 0L, i.toDouble), ("g", 1L, i.toDouble)))
    val dfS = same.toDF("grp", "uid", "value")
    val ks0 = FeaturePrep.ksDrift(dfS, "grp", col("uid"), "value").collect()
    assert(ks0.head.getDouble(3) == 0.0)

    val disj = (1 to 50).map(i => ("g", 0L, i.toDouble)) ++
      (51 to 100).map(i => ("g", 1L, i.toDouble))
    val ks1 = FeaturePrep.ksDrift(disj.toDF("grp", "uid", "value"),
      "grp", col("uid"), "value").collect()
    assert(ks1.head.getDouble(3) == 1.0)
    assert(ks1.head.getDouble(4) == 50.0) // gap peaks at the split point
  }

  test("calibrationBins: perfectly calibrated bins have zero gap") {
    // score = k/10 + 0.05; in bin k exactly that share of labels positive
    val rows = for {
      k <- 0 to 9; i <- 1 to 200
    } yield (k / 10.0 + 0.05, i <= (k * 20 + 10))
    val out = FeaturePrep.calibrationBins(
      rows.toDF("score", "y"), col("score"), col("y")).collect()
    assert(out.length == 10)
    for (r <- out) {
      assert(r.getLong(1) == 200L)
      assert(math.abs(r.getDouble(5)) < 1e-6) // gap ~ 0
    }
  }

  test("ksDrift and calibration bins stay in-range on real fixture data") {
    val ev = spark.read.parquet(s"${sfDir()}/events.parquet")
      .withColumn("ts", col("ts")) // schema passthrough
    val ks = FeaturePrep.ksDrift(ev, "event_type",
      pmod(col("user_id"), lit(2)), "value").collect()
    assert(ks.nonEmpty)
    assert(ks.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("acfDaily: a perfectly periodic series has acf(period) = 1") {
    // 200 days, value depends only on day % 4 → lag-4 correlation is 1
    val rows = (0 until 200).map { d =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:00").toLocalDateTime
        .plusDays(d.toLong).toString.replace('T', ' ') + ":00",
        10.0 + (d % 4) * 5.0)
    }
    val df = rows.toDF("dt", "v")
      .select(to_timestamp(col("dt")).as("dt"), col("v"))
    val acf = FeaturePrep.acfDaily(df, "dt", "v", 5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(acf(4L) - 1.0) < 1e-9)
    assert(acf(1L) < 0.0) // within-period lags anticorrelate
  }

  test("madOutliers: fence flags exactly the planted extremes") {
    val base = (1 to 101).map(i => ("g", i.toDouble)) // median 51, MAD 25
    val planted = Seq(("g", 1000.0), ("g", -1000.0))
    val out = FeaturePrep.madOutliers(
      (base ++ planted).toDF("grp", "v"), "grp", "v").collect().head
    assert(out.getDouble(2) == 51.0) // median survives the outliers
    assert(out.getLong(4) == 2L)
  }
}
