package graft.tools

import graft.GraftSession
import graft.analytics.FactorAnalysisEM

/** Print per-cell |loading| deltas vs the sklearn golden (fidelity probe). */
object FACheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.quiet(GraftSession.local("fa-check"))
    val merged = spark.read.parquet("src/test/resources/golden/merged_data.parquet")
    val golden = spark.read.parquet("src/test/resources/golden/factor_loadings.parquet")
      .collect().map(r => r.getString(0) -> r).toMap
    val model = FactorAnalysisEM.fit(merged, 5)
    println(s"[fa] converged after ${model.nIter} iters, ll=${model.logLikelihood.last}")
    val mine = FactorAnalysisEM.loadingsDF(spark, model)
      .collect().map(r => r.getString(0) -> r).toMap
    (1 to 5).foreach { f =>
      val c = s"Factor_${f}_loading"
      val deltas = golden.keys.toSeq.sorted.map { v =>
        val g = math.abs(golden(v).getAs[Double](c))
        val m = math.abs(mine(v).getAs[Double](c))
        (v, g, m, math.abs(g - m))
      }
      val worst = deltas.maxBy(_._4)
      val scale = deltas.map(_._2).max
      println(f"[fa] $c: worst |Δ|=${worst._4}%.3f at ${worst._1} " +
        f"(golden ${worst._2}%.3f vs mine ${worst._3}%.3f), col scale $scale%.1f, " +
        f"rel=${worst._4 / math.max(scale, 1)}%.5f")
    }
    spark.stop()
  }
}
