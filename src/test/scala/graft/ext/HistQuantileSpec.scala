package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketches.histTrailingQuantiles: the mergeable-histogram quantile
  * rollup. Pins (a) the one-bucket error bound est ≤ exact < est+width
  * (the histogram-sketch accuracy contract), (b) hand-computed ranks on
  * a tiny two-day fixture, (c) clamping of out-of-grid values.
  */
class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: ceil-rank quantiles from merged day grids") {
    // day1: 1..4, day2: 5..8 — trailing-2-day window at day2 = 1..8:
    // W=8, r50=4 → value 4 (bucket 0 with width 8 → est 0.0);
    // r90=ceil(7.2)=8 → value 8 (bucket 1 → est 8.0)
    val df = ((1 to 4).map(v => ("2024-01-01 00:00:00", v.toDouble)) ++
      (5 to 8).map(v => ("2024-01-02 00:00:00", v.toDouble)))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp_ntz").as("ts"), col("value"))
    val out = Sketches.histTrailingQuantiles(df, "ts", "value",
        windowDays = 2, width = 8.0, nBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 4L, 0.0, 2.0, 0.0, 4.0),
      ("2024-01-02", 8L, 0.0, 4.0, 8.0, 8.0)))
  }

  test("accuracy contract on real events: est <= exact < est + width") {
    val ev = graft.queries.Q.t(spark, sfDir(), "events")
    val out = Sketches.histTrailingQuantiles(ev, "ts", "value",
      windowDays = 7, width = 8.0, nBuckets = 64)
    val bad = out.filter(
      col("p50_exact") < col("p50_est") ||
        (col("p50_exact") >= col("p50_est") + 8.0 && col("p50_est") < 8.0 * 63) ||
        col("p90_exact") < col("p90_est") ||
        (col("p90_exact") >= col("p90_est") + 8.0 && col("p90_est") < 8.0 * 63))
    assert(bad.count() == 0)
    assert(out.count() > 0)
  }

  test("values beyond the grid clamp into the last bucket") {
    val df = Seq(("2024-01-01 00:00:00", 1e9), ("2024-01-01 00:00:00", -5.0))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp_ntz").as("ts"), col("value"))
    val out = Sketches.histTrailingQuantiles(df, "ts", "value",
        windowDays = 1, width = 8.0, nBuckets = 4)
      .collect()
    // W=2: r50=1 → -5.0 (bucket 0), r90=2 → 1e9 (clamped bucket 3 → 24.0)
    assert(out.head.getDouble(2) == 0.0 && out.head.getDouble(3) == -5.0)
    assert(out.head.getDouble(4) == 24.0 && out.head.getDouble(5) == 1e9)
  }
}
