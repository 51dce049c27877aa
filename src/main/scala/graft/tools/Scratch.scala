package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc profiling entry (not part of the library surface):
  * `runMain graft.tools.Scratch <sfDir> [--explain] <queryName>...`
  * times single queries and optionally prints their formatted plans.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.quiet(GraftSession.local("scratch"))
    val dir = args.head
    val explain = args.contains("--explain")
    args.drop(1).filterNot(_ == "--explain").foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      if (explain) df.explain("formatted")
      (1 to 2).foreach { i =>
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name build=$tBuild%.2f run$i: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
