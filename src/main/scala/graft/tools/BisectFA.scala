package graft.tools

import graft.GraftSession
import graft.analytics.FactorAnalysisEM
import org.apache.spark.sql.functions._

/** One-off adjudicator for the round-2 q42 bench regression: times the
  * declarative momentStats (current) against the prior RDD treeReduce
  * formulation on the same prepared input, several reps each, medians out.
  *
  * Usage: runMain graft.tools.BisectFA /root/testdata/sf0.1 [reps]
  */
object BisectFA {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.quiet(GraftSession.local("graft-bisect"))

    val df = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val (prepared, cols, _) = FactorAnalysisEM.prepare(df)
    val d = cols.length

    def oldMomentStats(): Long = {
      val rdd = prepared
        .select(cols.map(c => col(c).cast("double")): _*)
        .rdd
        .map(r => Array.tabulate(d)(i => if (r.isNullAt(i)) 0.0 else r.getDouble(i)))
      val (n, _, _) = rdd
        .mapPartitions { it =>
          var cnt = 0L
          val s = new Array[Double](d)
          val ss = new Array[Double](d * d)
          it.foreach { x =>
            cnt += 1
            var i = 0
            while (i < d) {
              s(i) += x(i)
              var j = 0
              while (j <= i) { ss(i * d + j) += x(i) * x(j); j += 1 }
              i += 1
            }
          }
          Iterator.single((cnt, s, ss))
        }
        .treeReduce { (a, b) =>
          var i = 0
          while (i < d) { a._2(i) += b._2(i); i += 1 }
          i = 0
          while (i < d * d) { a._3(i) += b._3(i); i += 1 }
          (a._1 + b._1, a._2, a._3)
        }
      n
    }

    def time(f: () => Any): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // warm-up both paths
    oldMomentStats(); FactorAnalysisEM.momentStats(prepared, cols)
    val oldTs = (1 to reps).map(_ => time(() => oldMomentStats()))
    val newTs = (1 to reps).map(_ =>
      time(() => FactorAnalysisEM.momentStats(prepared, cols)))
    // and the full q42 (prepare + fit + EM) for context
    val fullTs = (1 to reps).map(_ => time { () =>
      FactorAnalysisEM.fit(df, nComponents = 2)
    })
    println(f"old(treeReduce) runs: ${oldTs.map(t => f"$t%.3f").mkString(",")}  median=${med(oldTs)}%.3f")
    println(f"new(declarative) runs: ${newTs.map(t => f"$t%.3f").mkString(",")}  median=${med(newTs)}%.3f")
    println(f"full fit() runs: ${fullTs.map(t => f"$t%.3f").mkString(",")}  median=${med(fullTs)}%.3f")
    spark.stop()
  }
}
