package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time a SUBSET of SparkEntry queries in a fresh session, Bench-style
  * (noop-forced, warm-up pass, N reps) — isolates a query's cost from
  * whole-suite state (GC pressure, catalog growth, cache debris).
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <reps> <query>...
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.quiet(GraftSession.local("graft-timeq"))
    def force(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      ScaleCheck.extras.getOrElse(name, SparkEntry.queries(name))(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(force(_, "/root/testdata/sf0.001"))
    names.foreach { n =>
      val ts = (1 to reps).map(_ => force(n, sfDir))
      println(f"$n: ${ts.map(t => f"$t%.3f").mkString(",")}  min=${ts.min}%.3f")
    }
    spark.stop()
  }
}
