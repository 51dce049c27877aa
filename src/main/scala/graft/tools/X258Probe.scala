package graft.tools

import graft.GraftSession
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the q258 graph-ANN pipeline (r11): graph
  * build, brute-force reference, and each beam width separately.
  *
  * Usage: runMain graft.tools.X258Probe [sfDir]
  */
object X258Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.quiet(GraftSession.local("x258-probe"))
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val graph = timed("knnGraphExact(degree=6) + checkpoint") {
        Similarity.knnGraphExact(e, "vec_id", "embedding", 6).localCheckpoint()
      }
      timed("full beamRecallCurve") {
        Similarity.beamRecallCurve(e, "vec_id", "embedding", graph,
            col("vec_id") < 20, k = 10, efs = Seq(2, 4, 8), hops = 4,
            entryId = 0L)
          .write.mode("overwrite").format("noop").save()
      }
      for (ef <- Seq(2, 4, 8)) {
        timed(s"beamSearchTopK(ef=$ef, hops=4)") {
          Similarity.beamSearchTopK(e, "vec_id", "embedding", graph,
              col("vec_id") < 20, k = 10, ef = ef, hops = 4, entryId = 0L)
            .write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
