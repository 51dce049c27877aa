package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Stage breakdown for the x77 semantic-dedup production channel at the
  * replicated 100× point (VERDICT r8 #4): times the full operator, then
  * each internal stage in isolation — candidate generation (bucket join),
  * cosine verification, and the connected-components closure — so the
  * 23 s wall has an attributed owner before any optimization.
  *
  * Usage: runMain graft.tools.X77Probe [scaleDir]
  */
object X77Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val spark = GraftSession.quiet(GraftSession.local("x77-probe"))
    val S = graft.ext.Similarity
    val e = graft.queries.Q.t(spark, dir, "embeddings")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[x77probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("full_x77_cold") {
      S.semanticDedup(e, "vec_id", "embedding", dim = 64, threshold = 0.3,
        nBits = 12).write.format("noop").mode("overwrite").save()
    }

    // stage replication (semanticDedup's exact internals)
    val bucket = S.lshBucket(col("embedding"), 64, 12, 42L)
    val b = e.select(col("vec_id"), col("embedding"))
      .withColumn("_bucket", bucket)
    val a = b.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"),
      col("_bucket"))
      .repartition(spark.sparkContext.defaultParallelism)
    val c = b.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"),
      col("_bucket"))
    val cand = a.join(c, Seq("_bucket")).filter(col("id_a") < col("id_b"))
    val nCand = timed("candidate_count")(cand.count())
    println(s"[x77probe] candidates=$nCand")

    val pairs = cand
      .withColumn("cos_sim", round(S.cosine(col("vec_a"), col("vec_b")), 4))
      .filter(graft.util.PlanHints.noPushdown(col("cos_sim") >= 0.3))
      .select("id_a", "id_b")
    val nPairs = timed("verify_count")(pairs.count())
    println(s"[x77probe] verified_pairs=$nPairs")

    val pairsCk = timed("pairs_localCheckpoint")(pairs.localCheckpoint(true))
    timed("clusterIds_only") {
      graft.ext.Dedup.clusterIds(pairsCk)
        .write.format("noop").mode("overwrite").save()
    }

    timed("full_x77_warm") {
      S.semanticDedup(e, "vec_id", "embedding", dim = 64, threshold = 0.3,
        nBits = 12).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
