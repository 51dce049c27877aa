package graft.tools

import graft.{GraftSession, SparkEntry}

/** TimeQueries for the ScaleSweep namespace: fresh session, sf0.1 warm-up,
  * N noop-forced reps per query against an arbitrary data dir, resolving
  * names through ScaleCheck.extras (x-channels) as well as SparkEntry.
  * Used for the r6 VERDICT #2 variance adjudication: consecutive
  * fresh-session runs of q187_salted_join / x41_bootstrap_seeded at 100×.
  *
  * Usage: runMain graft.tools.IsolatedReps <dir> <reps> <query>...
  */
object IsolatedReps {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.quiet(GraftSession.local("graft-isoreps"))
    def queryOf(n: String) =
      ScaleCheck.extras.getOrElse(n, SparkEntry.queries(n))
    names.foreach { n =>
      queryOf(n)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      // warm at the TARGET dir too: the timed reps should measure the
      // plan, not the first cold parquet read of a multi-GB input (the
      // r7 adjudication traced q187's 2.5x session-min spread to disk
      // state; with a target-warm pass the probe floor was 8.7-12.8 s)
      queryOf(n)(spark, dir).write.format("noop").mode("overwrite").save()
      System.gc()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        queryOf(n)(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc()
        dt
      }
      println(f"[iso] $n: ${ts.map(t => f"$t%.2f").mkString(" ")}  " +
        f"min=${ts.min}%.2f max=${ts.max}%.2f spread=${ts.max / ts.min}%.2f")
    }
    spark.stop()
  }
}
