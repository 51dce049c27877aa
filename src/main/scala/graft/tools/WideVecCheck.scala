package graft.tools

import graft.GraftSession
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** dim=1024 scale probe (ScaleCheck's sibling for the vector ops): generates
  * `n` deterministic 1024-dim float vectors, then times lshBucket(16),
  * lshTopK(multi-probe), brute-force cosine top-k, and ivfAssignQuantized —
  * reporting per-row cost and the formatted-plan size, the two things that
  * regress if the hyperplane matrix ever falls back to per-plane literals.
  *
  * Usage: runMain graft.tools.WideVecCheck [nRows] (default 50000)
  */
object WideVecCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val dim = 1024
    val spark = GraftSession.quiet(GraftSession.local("graft-widevec"))

    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dim), j -> cast(sin(id * $dim + j) AS float))")
        .as("embedding"))
      .repartition(32).cache()
    vecs.count()

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[widevec] $label: $sec%.2f s  (${sec * 1e6 / n}%.1f us/row, n=$n, dim=$dim)")
    }

    val bucketed = vecs.withColumn("_b",
      Similarity.lshBucket(col("embedding"), dim, nBits = 16))
    val planChars = bucketed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).length
    println(s"[widevec] lshBucket(16x1024) formatted plan: $planChars chars")

    time("lshBucket nBits=16") {
      bucketed.write.format("noop").mode("overwrite").save()
    }
    time("lshTopK k=10 ham<=1") {
      Similarity.lshTopK(vecs, "vec_id", "embedding", 0L, 10,
        dim = dim, nBits = 16, probeHamming = 1)
        .write.format("noop").mode("overwrite").save()
    }
    time("bruteForceTopK k=10") {
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 10)
        .write.format("noop").mode("overwrite").save()
    }
    val centroids = vecs.filter(col("vec_id") < 8)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("cq"))
      .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    time("ivfAssignQuantized 8 cells") {
      vecs.withColumn("_c",
          Similarity.ivfAssignQuantized(col("embedding"), centroids))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
