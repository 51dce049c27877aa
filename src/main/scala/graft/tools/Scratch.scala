package graft.tools

import graft.{GraftSession, SparkEntry}

/** Profiling / spot-check harness: run named SparkEntry queries against a
  * testdata dir, show the result, optionally the formatted physical plan.
  *
  * Usage: runMain graft.tools.Scratch <sfDir> [--explain] <query> [<query>...]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val spark = GraftSession.quiet(GraftSession.local("graft-scratch"))
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.show(50, truncate = false)
      if (explain) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(f"== $n: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
