package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r11 probe: decompose one q99 PageRank iteration to find the ~1.9s
  * single-task stage. Usage: runMain graft.tools.X99Probe [sfDir]
  */
object X99Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.quiet(GraftSession.local("x99-probe"))
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val pairs = timed("pairs distinct+ckpt") {
        li.select(col("l_partkey").as("p"), (col("l_suppkey") + 1000000L).as("sn"))
          .distinct().localCheckpoint(true)
      }
      val e = pairs.select(col("p").as("src"), col("sn").as("dst"))
        .unionByName(pairs.select(col("sn").as("src"), col("p").as("dst")))
      val nodes = timed("nodes distinct+ckpt") {
        e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
          .distinct().localCheckpoint(true)
      }
      val nN = broadcast(nodes.agg(count(lit(1)).cast("long").as("n")))
      val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      val eDeg = timed("eDeg join+ckpt") { e.join(deg, "src").localCheckpoint(true) }
      var ranks = timed("ranks0 ckpt") {
        nodes.crossJoin(nN).select(col("node"), (lit(1.0) / col("n")).as("r"))
          .localCheckpoint(true)
      }
      println("[probe] eDeg rows=" + eDeg.count() + " nodes=" + nodes.count())
      val contribs = eDeg
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), (col("r") / col("deg")).cast(DecimalType(28, 12)).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val c2 = timed("contribs ckpt (iter body A)") { contribs.localCheckpoint(true) }
      val newRanks = nodes.crossJoin(nN)
        .join(c2, col("node") === col("dst"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(0.85)) / col("n")
            + lit(0.85) * coalesce(col("s").cast("double"), lit(0.0))).as("r"))
      timed("ranks update ckpt (iter body B)") { newRanks.localCheckpoint(true) }
      // and the fused original body for comparison
      val fused = eDeg
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), (col("r") / col("deg")).cast(DecimalType(28, 12)).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val fusedRanks = nodes.crossJoin(nN)
        .join(fused, col("node") === col("dst"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(0.85)) / col("n")
            + lit(0.85) * coalesce(col("s").cast("double"), lit(0.0))).as("r"))
      val ck = timed("FUSED full iteration ckpt") { fusedRanks.localCheckpoint(true) }
      if (rep == 2) println(ck.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
