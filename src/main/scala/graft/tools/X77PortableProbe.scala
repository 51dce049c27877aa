package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r11 probe: q77's PORTABLE semantic-dedup internals (4-bit quantized
  * buckets, threshold 0.3) — candidate count, verified-pair count, and
  * clusterIds wall, separated.
  *
  * Usage: runMain graft.tools.X77PortableProbe [sfDir]
  */
object X77PortableProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.quiet(GraftSession.local("x77p-probe"))
    val S = graft.ext.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val b = e.select(col("vec_id"), col("embedding"))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("_bucket", S.lshBucketQuantized(col("embedding"), 64, 4))
        .localCheckpoint(false)
      val a = b.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"),
        col("_bucket"))
      val c = b.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"),
        col("_bucket"))
      val cand = a.join(c, Seq("_bucket")).filter(col("id_a") < col("id_b"))
      println("[probe] candidates=" + timed("candidate_count")(cand.count()))
      val pairs = cand
        .withColumn("cos_sim", round(S.cosine(col("vec_a"), col("vec_b")), 4))
        .filter(graft.util.PlanHints.noPushdown(col("cos_sim") >= 0.3))
        .select("id_a", "id_b")
      println("[probe] verified=" + timed("verify_count")(pairs.count()))
      val pairsCk = timed("pairs ckpt")(pairs.localCheckpoint(true))
      timed("clusterIds") {
        graft.ext.Dedup.clusterIds(pairsCk)
          .write.format("noop").mode("overwrite").save()
      }
      timed("full q77 body") {
        S.semanticDedup(e, "vec_id", "embedding", dim = 64, threshold = 0.3,
            nBits = 4, portable = true)
          .select("vec_id").orderBy("vec_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
