package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ext.Similarity

/** Stage-level timing of the x214 IVF-PQ 1-NN channel at a scaled dir:
  * encode/assign scan, cell-join pair count, full k=1 join. Used to
  * adjudicate where the wall-clock goes before optimizing.
  *
  * Usage: runMain graft.tools.PqProfile [scaledDir]
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val spark = GraftSession.quiet(GraftSession.local("pq-profile"))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val centroids = time("collect centroids") {
      e.filter(col("vec_id") < 512).orderBy("vec_id")
        .select(transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("cq"))
        .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    }
    val cbs = time("collect codebooks") {
      Similarity.pqCodebooksFixed(e, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16)
    }
    val tables = Similarity.sdcTables(cbs)

    def quantized(as: String) =
      e.select(col("vec_id").as(as),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("_vq"))

    val c = quantized("c_id")
      .select(col("c_id"),
        Similarity.ivfAssignQuantizedLongs(col("_vq"), centroids).as("_cell"),
        Similarity.pqEncodeQuantized(col("_vq"), cbs).as("_ccodes"))
      .filter(col("_cell") >= 0)
    time("corpus assign+encode (count)") { println("  rows: " + c.count()) }

    val q = quantized("q_id")
      .select(col("q_id"),
        Similarity.ivfProbeCells(col("_vq"), centroids, 2).as("_cells"),
        Similarity.pqEncodeQuantized(col("_vq"), cbs).as("_qcodes"))
      .withColumn("_cell", explode(col("_cells")))
      .drop("_cells")
    time("query probe+encode (count)") { println("  rows: " + q.count()) }

    val cr = c.repartition(spark.sparkContext.defaultParallelism)
    val scored = q.join(cr, Seq("_cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        Similarity.pqSdcDist(col("_qcodes"), col("_ccodes"), tables)
          .as("sdc_dist"))
    time("pair scoring (count)") { println("  pairs: " + scored.count()) }

    time("full pqKnnJoin k=1 (noop)") {
      Similarity.pqKnnJoin(e, e, "vec_id", "embedding",
        k = 1, centroids, cbs, nProbe = 2)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
