package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.queries.Q._

/** Similarity search over `embeddings` (vec_id, embedding: Array[Float],
  * label). Cosine math is sequential double arithmetic in both engines →
  * the brute-force paths are oracle-backed; LSH/IVF depend on seeded
  * engine-side randomness → rows-only + ScalaTest recall checks.
  */
object SimilarityQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---- brute-force cosine top-k for a fixed query vector (vec_id 0)
    QueryDef(
      "q31_cosine_topk",
      (s, dir) =>
        Similarity.bruteForceTopK(
          t(s, dir, "embeddings"), "vec_id", "embedding", queryId = 0L, k = 10),
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT e.vec_id,
             |round(
             |  list_sum(list_transform(range(1, len(e.embedding) + 1),
             |    i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
             |  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
             |   sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 4)
             |  AS cos_sim
             |FROM embeddings e, q WHERE e.vec_id <> 0
             |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
    ),

    // ---- per-label centroid cosine (grouped vector aggregation):
    //      avg pairwise-free representation via mean dot with a fixed vector
    QueryDef(
      "q32_label_similarity_stats",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe")))
        e.crossJoin(q)
          .withColumn("cos_sim", Similarity.cosine(col("embedding"), col("qe")))
          .groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            round(min(col("cos_sim")), 4).as("min_sim"),
            round(max(col("cos_sim")), 4).as("max_sim"),
            round(percentile(col("cos_sim"), lit(0.5)), 4).as("median_sim")
          )
          .orderBy("label")
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
             |sims AS (SELECT e.label,
             |  list_sum(list_transform(range(1, len(e.embedding) + 1),
             |    i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
             |  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
             |   sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos_sim
             |  FROM embeddings e, q)
             |SELECT label, count(*) AS n,
             |round(min(cos_sim), 4) AS min_sim,
             |round(max(cos_sim), 4) AS max_sim,
             |round(quantile_cont(cos_sim, 0.5), 4) AS median_sim
             |FROM sims GROUP BY label ORDER BY label""".stripMargin)
    ),

    // ---- LSH-bucketed ANN top-k (seeded hyperplanes → rows-only check;
    //      recall vs brute force asserted in ScalaTest)
    QueryDef(
      "q33_ann_lsh_topk",
      (s, dir) =>
        Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          queryId = 0L, k = 10, dim = 64, nBits = 4),
      None
    ),

    // ---- IVF ANN: KMeans coarse quantizer, probe the 3 nearest cells
    //      (seeded clustering → rows-only; recall asserted in ScalaTest)
    QueryDef(
      "q53_ann_ivf_topk",
      (s, dir) => {
        val idx = Similarity.ivfIndex(t(s, dir, "embeddings"), "embedding",
          kClusters = 16)
        Similarity.ivfTopK(idx, "vec_id", "embedding", queryId = 0L, k = 10,
          nProbe = 3)
      },
      None
    ),

    // ---- the SAME sign-random-projection bucketing structure as q33/q34,
    //      quantized to exact integer math (integer planes × round(v·1000))
    //      → every bucket id is DuckDB-oracled. Production ANN keeps the
    //      full-precision seeded-Gaussian planes (which have no cross-engine
    //      twin); this pins the bucketing machinery itself.
    QueryDef(
      "q70_ann_bucket_portable",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.lshBucketQuantized(col("embedding"), dim = 64, nBits = 8)
              .as("bucket"))
          .orderBy("vec_id"),
      Some {
        val bits = Similarity.quantPlanes(64, 8).zipWithIndex.map {
          case (p, i) =>
            val lst = p.mkString("[", ",", "]")
            s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
              s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" +\n  ")
        s"""WITH q AS (SELECT vec_id,
           |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
           |  FROM embeddings)
           |SELECT vec_id, CAST($bits AS BIGINT) AS bucket
           |FROM q ORDER BY vec_id""".stripMargin
      }
    ),

    // ---- the DISTRIBUTED half of q53's IVF, oracled: assignment of every
    //      vector to its nearest centroid in an existing quantizer (the
    //      ingest-time routing step at lake scale; only KMeans training —
    //      driver-side ML — has no SQL twin). Centroids = the 8 lowest-id
    //      embeddings, quantized; all distances exact integer math.
    QueryDef(
      "q72_ivf_assign_portable",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        emb.select(col("vec_id"),
            Similarity.ivfAssignQuantized(col("embedding"), centroids)
              .as("cell"))
          .orderBy("vec_id")
      },
      Some("""WITH q AS (SELECT vec_id,
             |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
             |  FROM embeddings),
             |c AS (SELECT vec_id AS cid, vq AS cq FROM q WHERE vec_id < 8),
             |d AS (SELECT q.vec_id, c.cid,
             |  list_sum(list_transform(generate_series(1, 64),
             |    j -> (q.vq[j] - c.cq[j]) * (q.vq[j] - c.cq[j]))) AS dist
             |  FROM q, c),
             |r AS (SELECT vec_id, cid,
             |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             |  FROM d)
             |SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM r
             |WHERE rn = 1 ORDER BY vec_id""".stripMargin)
    ),

    // ---- embedding near-duplicate pairs (LSH + exact verify → rows-only).
    //      The fixture's vectors are near-orthogonal (max pairwise cosine
    //      ≈0.6), so the "near-dup" bar is set at the top ~0.1% of pairs.
    QueryDef(
      "q34_embedding_near_dups",
      (s, dir) =>
        Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, threshold = 0.35, nBits = 4),
      None
    )
  )
}
