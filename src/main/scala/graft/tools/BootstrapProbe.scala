package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the q41 portable bootstrap: separates the
  * stats pass, the hash/quantize projection, and the fused aggregate so a
  * regression can be attributed instead of guessed at.
  *
  * Usage: runMain graft.tools.BootstrapProbe <sfDir> [reps]
  */
object BootstrapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.quiet(GraftSession.local("graft-probe"))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // raw single-thread loop speed: the cost model's floor (no Spark at all)
    {
      val nSim = 1000; val k = 4
      val mask = (1L << 30) - 1
      val cons = graft.functions.MinHashSignature.affineConsts(nSim, 30)
      val a = cons.map(_._1).toArray; val b = cons.map(_._2).toArray
      val t = graft.analytics.Bootstrap.PoissonCdf
        .map(c => math.floor(c * (1L << 30).toDouble).toLong)
      val buf = new Array[Long]((1 + k) * nSim)
      val vs = Array(255000L, 529500000L, 500L, 400L)
      val offs = Array.tabulate(k)(ci => (1 + ci) * nSim)
      (1 to 2).foreach { pass =>
        val rows = 600000
        val t0 = System.nanoTime()
        var row = 0
        while (row < rows) {
          val h = (row * 0x9E3779B97F4A7C15L >>> 34) & mask
          var r = 0
          while (r < nSim) {
            val x = (a(r) * h + b(r)) & mask
            val y = ((x * x) >> 15) & mask
            var w = 0L
            var j = 0
            while (j < 8) { w += (t(j) - 1 - y) >>> 63; j += 1 }
            buf(r) += w
            var ci = 0
            while (ci < k) { buf(offs(ci) + r) += w * vs(ci); ci += 1 }
            r += 1
          }
          row += 1
        }
        println(f"  raw loop pass $pass (600k rows x 1000 reps, 1 thread): " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs (checksum ${buf.sum})")
      }
      // variant: w via 4096-cell lookup table on y's top bits
      val wTab: Array[Byte] = Array.tabulate(1 << 12) { c =>
        def wOf(y: Long) = t.count(tj => y >= tj).toByte
        val lo = c.toLong << 18; val hi = ((c + 1).toLong << 18) - 1
        if (wOf(lo) == wOf(hi)) wOf(lo) else -1: Byte
      }
      println(s"  ambiguous cells: ${wTab.count(_ < 0)}/${wTab.length}")
      java.util.Arrays.fill(buf, 0L)
      (1 to 2).foreach { pass =>
        val rows = 600000
        val t0 = System.nanoTime()
        var row = 0
        while (row < rows) {
          val h = (row * 0x9E3779B97F4A7C15L >>> 34) & mask
          var r = 0
          while (r < nSim) {
            val x = (a(r) * h + b(r)) & mask
            val y = ((x * x) >> 15) & mask
            var w = wTab((y >>> 18).toInt).toLong
            if (w < 0) {
              w = 0L; var j = 0
              while (j < 8) { w += (t(j) - 1 - y) >>> 63; j += 1 }
            }
            buf(r) += w
            var ci = 0
            while (ci < k) { buf(offs(ci) + r) += w * vs(ci); ci += 1 }
            r += 1
          }
          row += 1
        }
        println(f"  table loop pass $pass (600k rows x 1000 reps, 1 thread): " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs (checksum ${buf.sum})")
      }
    }

    (1 to reps).foreach { rep =>
      println(s"-- rep $rep")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(concat_ws(":", col("l_orderkey"), col("l_linenumber"))
          .as("_k") +: cols.map(c => col(c).cast("double")): _*)
      timed("count pass")(
        li.agg(count(lit(1)), cols.map(c => count(col(c))): _*).head())
      val mask = (1L << 30) - 1
      val h = graft.ext.Dedup.portableHash60(concat(lit("bs|"), col("_k")))
        .bitwiseAND(lit(mask))
      val base = li.repartition(spark.sparkContext.defaultParallelism)
        .select(h.as("_h") +: cols.zipWithIndex.map { case (c, i) =>
          floor(col(c) * lit(10000) + lit(0.5)).cast("long").as(s"_q$i")
        }: _*)
      timed("hash+quantize only")(base.agg(count(lit(1))).head())
      val aggDf = base.groupBy().agg(
        graft.functions.GraftFunctions.bootstrapPoissonAgg(1000, col("_h"),
          cols.indices.map(i => col(s"_q$i"))).as("_bs"))
      val agg = timed("fused agg pass")(aggDf.head())
      println(s"  replicates returned: ${agg.getSeq[Any](0).size}")
      timed("full poissonPortable")(
        graft.analytics.Bootstrap.poissonPortable(spark,
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(concat_ws(":", col("l_orderkey"), col("l_linenumber"))
              .as("rk"),
              col("l_quantity"), col("l_extendedprice"), col("l_discount"),
              col("l_tax")),
          "rk", nSim = 1000).collect())
    }
    spark.stop()
  }
}
