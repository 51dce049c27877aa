package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketches.trimmedMeanByGroup: the grid decomposition (total − tail
  * sums, within-cut-bucket prefixes) must equal the bare rank-interval
  * definition, including across bucket boundaries and ties at the cut.
  */
class TrimmedMeanSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[Double]): (Long, Double) = {
    val sorted = vals.sorted
    val k = vals.length / 10
    val interior = sorted.slice(k, vals.length - k)
    // mirror the DECIMAL(18,6) routing: exact 6-dp rationals
    val sum = interior.map(v => BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).sum
    (k.toLong, (sum / interior.length).toDouble)
  }

  test("hand fixture: trims exactly k per side, ties at the cut are safe") {
    // g=a: 20 values, k=2; ties straddle the low cut
    val a = Seq(1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0,
      9.0, 10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 100.0)
    val df = a.map(("a", _)).toDF("g", "v")
    val out = Sketches.trimmedMeanByGroup(df, "g", "v",
      width = 4.0, nBuckets = 8).head()
    val (k, expect) = brute(a)
    assert(out.getLong(1) == 20L && out.getLong(2) == k)
    assert(math.abs(out.getDouble(4) - expect) < 1e-9,
      s"got ${out.getDouble(4)}, want $expect")
  }

  test("pseudorandom groups at every width agree with brute force") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 500).map(i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 5000) / 10.0))
    val df = data.toDF("g", "v")
    Seq(2.0, 8.0, 64.0).foreach { w =>
      val out = Sketches.trimmedMeanByGroup(df, "g", "v",
          width = w, nBuckets = 64)
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        val (_, expect) = brute(rows.map(_._2))
        assert(math.abs(out(g) - expect) < 1e-9,
          s"width $w group $g: ${out(g)} vs $expect")
      }
    }
  }

  test("winsorized: clamped tails match brute force; >= trimmed on " +
    "right-heavy tails only when outliers dominate") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 400).map(i =>
      (s"g${i % 2}", math.floor(rnd.nextDouble() * 4000) / 10.0))
    val out = Sketches.winsorizedMeanByGroup(data.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val k = rows.length / 10
      val clamped = Seq.fill(k)(sorted(k)) ++
        sorted.slice(k, rows.length - k) ++
        Seq.fill(k)(sorted(rows.length - k - 1))
      val expect = (clamped.map(v => BigDecimal(v).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum / clamped.length).toDouble
      assert(math.abs(out(g) - expect) < 1e-9, s"$g: ${out(g)} vs $expect")
    }
  }

  test("tiny groups (W < 10): k = 0, trimmed mean equals the raw mean") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 30.0)).toDF("g", "v")
    val out = Sketches.trimmedMeanByGroup(df, "g", "v").head()
    assert(out.getLong(2) == 0L)
    assert(math.abs(out.getDouble(3) - out.getDouble(4)) < 1e-12)
  }

  test("null groups drop explicitly; surviving groups' means unchanged " +
    "(a null g must not zero its within-bucket prefix sums)") {
    val clean = (1 to 40).map(i => ("a", i.toDouble)).toDF("g", "v")
    val dirty = clean.unionByName(
      (1 to 40).map(i => (null.asInstanceOf[String], i * 100.0))
        .toDF("g", "v"))
    val cleanRows = Sketches.trimmedMeanByGroup(clean, "g", "v").collect()
    val dirtyRows = Sketches.trimmedMeanByGroup(dirty, "g", "v").collect()
    assert(dirtyRows.map(_.getString(0)).toSet == Set("a"))
    assert(cleanRows.toSeq == dirtyRows.toSeq)
  }
}
