package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Similarity
import graft.queries.Q._

/** Similarity search over `embeddings` (vec_id, embedding: Array[Float],
  * label). Cosine math is sequential double arithmetic in both engines →
  * the brute-force paths are oracle-backed; LSH/IVF depend on seeded
  * engine-side randomness → rows-only + ScalaTest recall checks.
  */
object SimilarityQueries {

  /** Operating point shared by q33 and the q75 recall pin: 4-bit SRP with
    * Hamming<=1 multi-probe — on this corpus (weak structure: top-10 sims
    * 0.28-0.37 vs mean 0.014) a single probe at any nBits draws recall@10
    * in [0, 0.4] depending on the plane draw; probing the 5 Hamming<=1
    * buckets (~1/3 of rows scanned) lifts the expected recall to ~0.45.
    * Declared BEFORE `defs`: `recallOracleSql` is evaluated eagerly while
    * `defs` is constructed, so a later declaration would still read 0.
    */
  private val RecallBits = 4
  private val RecallProbe = 1

  /** q77 operating point: 4-bit quantized buckets (candidate recall over
    * selectivity — dedup must FIND the dups) and a threshold low enough
    * that this corpus's moderate-similarity pairs (top sims 0.28-0.37)
    * actually cluster.
    */
  private val SemBits = 4
  private val SemThreshold = 0.3
  private val DcgQueries = 10

  /** PQ operating point: 8 subspaces of 8 dims, 16 codewords each.
    * (Also ABOVE `defs` — see RecallBits.)
    */
  private val PqM = 8
  private val PqK = 16

  /** q258 graph-ANN operating point: degree-6 exact neighbor graph,
    * 4 synchronized hops from entry node 0, 20 query vectors, recall@10
    * across beam widths 2/4/8. (ABOVE `defs` — see RecallBits.)
    */
  private val BeamDegree = 6
  private val BeamHops = 4
  private val BeamK = 10
  private val BeamEfs = Seq(2, 4, 8)
  private val BeamNq = 20

  /** q248 operating grid: nProbe (of 8 coarse cells) × codebook size
    * (2-bit/4-bit codes), recall@CurveK against exact quantized-L2 ground
    * truth. ABOVE `defs` (the q75 init-order trap).
    */
  private val CurveK = 10
  private val CurveProbes = Seq(1, 2, 4)
  private val CurveCodes = Seq(4, 16) // 2-bit / 4-bit per subspace

  /** q181 operating point: k clusters, 3 assignment passes (2 snapped
    * updates), snap bound B > max quantized |value| (~580 here).
    */
  private val KmK = 8
  private val KmIters = 3
  private val KmB = 2000

  /** q182 operating point (pool width, selections, λ/μ as exact double
    * literals rendered identically in the oracle SQL).
    */
  private val MmrPool = 20
  private val MmrK = 5

  /** q183: eval holdout = vec_id % DeconMod == 0. */
  private val DeconMod = 97

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

    // ---- LSH-bucketed ANN top-k, oracled DIRECTLY on the production
    //      operator: the seeded-Gaussian hyperplanes are pure data inlined
    //      verbatim into the SQL (the q75 trick), so buckets, the Hamming≤1
    //      multi-probe predicate AND the exact-cosine re-rank all
    //      hash-match. Recall stays pinned by q75.
    QueryDef(
      "q33_ann_lsh_topk",
      (s, dir) =>
        Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          queryId = 0L, k = 10, dim = 64, nBits = RecallBits,
          probeHamming = RecallProbe),
      Some(lshTopKOracleSql)
    ),

    // ---- IVF ANN top-k, oracled end-to-end against the FIXED-RULE
    //      quantizer (16 lowest-id vectors, round(v·1000) integer cells —
    //      the q72 family): routing, probe selection and exact-cosine
    //      re-rank all hash-match. The KMeans-trained quantizer
    //      (ivfIndex/ivfTopK — driver-ML, no SQL twin) is the x53
    //      production channel; its recall stays asserted in ScalaTest.
    QueryDef(
      "q53_ann_ivf_topk",
      (s, dir) =>
        Similarity.ivfTopKFixed(t(s, dir, "embeddings"), "vec_id",
          "embedding", queryId = 0L, k = 10, kCells = 16, nProbe = 3),
      Some(ivfTopKFixedOracleSql)
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

    // ---- embedding near-duplicate pairs (LSH + exact verify), oracled
    //      DIRECTLY on the production operator: seeded-Gaussian planes
    //      inlined as SQL literals (the q75/q33 trick) reproduce the exact
    //      bucket candidate sets; verify is the rounded-cosine cut. The
    //      fixture's vectors are near-orthogonal (max pairwise cosine
    //      ≈0.6), so the "near-dup" bar is set at the top ~0.1% of pairs.
    QueryDef(
      "q34_embedding_near_dups",
      (s, dir) =>
        Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, threshold = 0.35, nBits = 4),
      Some(nearDupPairsOracleSql)
    ),

    // ---- the ANN QUALITY contract, oracled: recall@10 of (a) the
    //      production lshTopK path — its seeded-Gaussian planes are pure
    //      data, inlined verbatim into the oracle SQL — and (b) an IVF
    //      probe against the fixed q72 quantizer (3 nearest cells), both
    //      against brute-force cosine top-10, all computed independently
    //      in BOTH engines. A recall change from ANY cause (plane drift,
    //      bucket math, probe selection, top-k ordering) breaks the hash.
    QueryDef(
      "q75_ann_recall",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val k = 10
        val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", 0L, k)
        val lsh = Similarity.lshTopK(e, "vec_id", "embedding", 0L, k,
          dim = 64, nBits = RecallBits, probeHamming = RecallProbe)
        // IVF probe against the FIXED quantizer of q72 (8 lowest-id
        // vectors, quantized): cell selection is exact integer math on the
        // driver, mirrored 1:1 in the oracle SQL
        val centroids = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        val qq = e.filter(col("vec_id") === 0)
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")))
          .head().getSeq[Long](0)
        val cells = centroids.zipWithIndex
          .map { case (c, i) =>
            (i, c.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum)
          }
          .sortBy { case (i, d) => (d, i) }.take(3).map(_._1.toLong)
        val qv = broadcast(e.filter(col("vec_id") === 0)
          .select(col("embedding").as("_q_vec")))
        val ivfTop = e
          .withColumn("_cell",
            Similarity.ivfAssignQuantized(col("embedding"), centroids))
          .filter(col("_cell").isin(cells: _*) && col("vec_id") =!= 0)
          .crossJoin(qv)
          .select(col("vec_id"),
            round(Similarity.cosine(col("embedding"), col("_q_vec")), 4)
              .as("cos_sim"))
          .orderBy(desc("cos_sim"), asc("vec_id"))
          .limit(k)
        val bruteIds = brute.select("vec_id")
        lsh.select("vec_id").join(bruteIds, "vec_id")
          .agg((count(lit(1)) / 10.0).as("recall_lsh"))
          .crossJoin(ivfTop.select("vec_id").join(bruteIds, "vec_id")
            .agg((count(lit(1)) / 10.0).as("recall_ivf")))
      },
      Some(recallOracleSql)
    ),

    // ---- embedding-level near-dup DEDUP, oracled END-TO-END: quantized
    //      SRP buckets (q70's portable family) → rounded-cosine verify →
    //      CONNECTED COMPONENTS (min-label fixpoint; the DuckDB twin
    //      computes the same closure with a recursive CTE) → keep lowest
    //      id per cluster. The one extension operator whose hardest part
    //      (transitive clustering) was previously only spec-tested.
    QueryDef(
      "q77_semantic_dedup",
      (s, dir) =>
        Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id",
            "embedding", dim = 64, threshold = SemThreshold,
            nBits = SemBits, portable = true)
          .select("vec_id").orderBy("vec_id"),
      Some(semanticDedupOracleSql)
    ),

    // ---- batch k-NN JOIN (top-k neighbors for EVERY query vector), the
    //      retrieval/labeling shape: query side explodes its multi-probe
    //      bucket set and equi-joins the bucketed corpus (never replicated,
    //      no quadratic predicate); per-query window ranks. Quantized
    //      plane family → full DuckDB twin.
    QueryDef(
      "q78_knn_join",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.knnJoin(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
          k = 3, dim = 64, nBits = SemBits, probeHamming = 1,
          portable = true)
      },
      Some(knnJoinOracleSql)
    ),

    // ---- PRODUCT QUANTIZATION encode, oracled: each 64-dim vector →
    //      8 codes (nearest codeword per 8-dim subspace, exact integer L2,
    //      ties to lowest index; one native ivf_argmin per subspace).
    //      Codebooks = the 16 lowest-id rows' quantized subvectors (the
    //      q72 fixed-quantizer trick); production trains via pqTrain.
    QueryDef(
      "q80_pq_codes",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val cbs = Similarity.pqCodebooksFixed(e, "vec_id", "embedding",
          dim = 64, m = PqM, kCodes = PqK)
        // one scalar column per code (q69's precedent: the driver compare
        // sorts rows by the alphabetically-first column, which must never
        // be an array)
        // r11: quantization and codes materialized as attributes — the
        // inline form re-ran the full encode once per projected code
        e.select(col("vec_id"),
            Similarity.quantVec(col("embedding")).as("_vq"))
          .select(col("vec_id"),
            Similarity.pqEncodeQuantized(col("_vq"), cbs).as("_codes"))
          .select(col("vec_id") +:
            (0 until PqM).map(s => element_at(col("_codes"), s + 1)
              .as(s"c$s")): _*)
          .orderBy("vec_id")
      },
      Some(pqCodesOracleSql)
    ),

    // ---- PQ asymmetric-distance top-k: rank ALL vectors by ADC score
    //      against query 0 using only their 8 codes + the query's lookup
    //      tables (m integer lookups per row — the billion-row ranking
    //      path). Exact integer math end-to-end → hash-matched.
    QueryDef(
      "q81_pq_adc_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val cbs = Similarity.pqCodebooksFixed(e, "vec_id", "embedding",
          dim = 64, m = PqM, kCodes = PqK)
        val qq = e.filter(col("vec_id") === 0)
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")))
          .head().getSeq[Long](0).toIndexedSeq
        val tables = Similarity.pqAdcTables(qq, cbs)
        e.filter(col("vec_id") =!= 0)
          // r11: _vq/_codes as materialized attributes (the q84 rule)
          .select(col("vec_id"),
            Similarity.quantVec(col("embedding")).as("_vq"))
          .select(col("vec_id"),
            Similarity.pqEncodeQuantized(col("_vq"), cbs).as("_codes"))
          .select(col("vec_id"),
            Similarity.pqAdcScore(col("_codes"), tables).as("adc"))
          .orderBy(asc("adc"), asc("vec_id"))
          .limit(10)
      },
      Some(pqAdcOracleSql)
    ),

    // ---- IVF-PQ, the canonical billion-scale ANN layout, composed and
    //      oracled end-to-end: coarse-quantizer cell routing (q72's fixed
    //      8-cell quantizer) prunes the scan to the 3 cells nearest the
    //      query, then PQ ADC (q81's fixed codebooks) ranks the survivors
    //      — every step exact integer math with a DuckDB twin.
    QueryDef(
      "q82_ivfpq_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val centroids = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        val cbs = Similarity.pqCodebooksFixed(e, "vec_id", "embedding",
          dim = 64, m = PqM, kCodes = PqK)
        val qq = e.filter(col("vec_id") === 0)
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")))
          .head().getSeq[Long](0).toIndexedSeq
        val cells = centroids.zipWithIndex
          .map { case (c, i) =>
            (i, c.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum)
          }
          .sortBy { case (i, d) => (d, i) }.take(3).map(_._1.toLong)
        val tables = Similarity.pqAdcTables(qq, cbs)
        // r11: one materialized quantization feeds cell routing and codes
        e.select(col("vec_id"),
            Similarity.quantVec(col("embedding")).as("_vq"))
          .withColumn("_cell",
            Similarity.ivfAssignQuantizedLongs(col("_vq"), centroids))
          .filter(col("_cell").isin(cells: _*) && col("vec_id") =!= 0)
          .select(col("vec_id"),
            Similarity.pqEncodeQuantized(col("_vq"), cbs).as("_codes"))
          .select(col("vec_id"),
            Similarity.pqAdcScore(col("_codes"), tables).as("adc"))
          .orderBy(asc("adc"), asc("vec_id"))
          .limit(10)
      },
      Some(ivfPqOracleSql)
    ),

    // ---- per-label centroid census (embedding drift / cluster-quality
    //      monitoring): quantized components posexploded, integer sums per
    //      (label, position), norms DECIMAL-routed — fully engine-exact
    QueryDef(
      "q108_centroid_census",
      (s, dir) => {
        val comps = t(s, dir, "embeddings")
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("label"), col("pos"),
            round(col("v").cast("double") * 1000).cast("long").as("q"))
        val perPos = comps.groupBy("label", "pos")
          .agg(sum(col("q")).as("sq"), count(lit(1)).cast("long").as("n"))
        val cq = col("sq").cast("double") / col("n")
        perPos
          .select(col("label"), col("n"),
            round(cq * cq, 6).cast(DecimalType(30, 6)).as("c2"))
          .groupBy("label")
          .agg(max(col("n")).as("n_vecs"),
            round(sqrt(sum(col("c2")).cast("double")) / lit(1000.0), 6)
              .as("centroid_norm"))
          .orderBy("label")
      },
      Some("""WITH q AS (
             |  SELECT CAST(label AS BIGINT) AS label,
             |    unnest(list_transform(embedding,
             |           x -> round(x::DOUBLE * 1000)::BIGINT)) AS qv,
             |    generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |g AS (
             |  SELECT label, pos, CAST(sum(qv) AS BIGINT) AS sq,
             |    count(*) AS n
             |  FROM q GROUP BY 1, 2),
             |c AS (
             |  SELECT label, n,
             |    CAST(round((CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n), 6)
             |         AS DECIMAL(30,6)) AS c2
             |  FROM g)
             |SELECT label, max(n) AS n_vecs,
             |  round(sqrt(CAST(sum(c2) AS DOUBLE)) / CAST(1000.0 AS DOUBLE), 6)
             |    AS centroid_norm
             |FROM c GROUP BY 1 ORDER BY label""".stripMargin)
    ),

    // ---- int8 affine-quantization census: the 4×-compression decision
    //      for a float32 embedding corpus — per-vector scale + DECIMAL-
    //      routed reconstruction error (order-independent), codes round
    //      half-away identically in both engines on the ≥0 argument
    QueryDef(
      "q124_int8_quantization",
      (s, dir) =>
        Similarity.int8QuantizationCensus(t(s, dir, "embeddings"),
            "vec_id", "embedding")
          .orderBy("vec_id"),
      Some("""WITH b AS (
             |  SELECT vec_id,
             |    CAST(list_min(embedding) AS DOUBLE) AS lo,
             |    CAST(list_max(embedding) AS DOUBLE) AS hi,
             |    embedding AS v
             |  FROM embeddings),
             |s AS (
             |  SELECT vec_id, lo, hi,
             |    (hi - lo) / CAST(255.0 AS DOUBLE) AS sc, v
             |  FROM b),
             |e AS (
             |  SELECT vec_id, lo, hi, sc, CAST(unnest(v) AS DOUBLE) AS x
             |  FROM s),
             |q AS (
             |  SELECT vec_id, lo, hi, sc, x,
             |    CASE WHEN sc = 0 THEN CAST(0 AS DOUBLE)
             |         ELSE round((x - lo) / sc, 0) END AS qv
             |  FROM e),
             |er AS (
             |  SELECT vec_id, lo, hi, qv,
             |    abs(x - (lo + qv * sc)) AS err
             |  FROM q)
             |SELECT vec_id, round(lo, 6) AS v_min, round(hi, 6) AS v_max,
             |  count(*) AS n_dims,
             |  CAST(sum(CAST(round(err, 9) AS DECIMAL(18,9))) AS DOUBLE)
             |    AS total_abs_err,
             |  CAST(max(qv) AS BIGINT) AS max_q
             |FROM er GROUP BY 1, 2, 3 ORDER BY vec_id""".stripMargin)
    ),

    // ---- hard-negative mining: per anchor, the most-similar CROSS-label
    //      vector — the contrastive-pair construction step. Exact double
    //      cosine (the q31 sequential-IEEE argument) → fully oracled;
    //      per-anchor argmax via row_number over (sim desc, id asc)
    QueryDef(
      "q141_hard_negatives",
      (s, dir) =>
        Similarity.hardNegatives(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label"),
      Some("""WITH valid AS (
             |  SELECT vec_id, label, embedding FROM embeddings
             |  WHERE embedding IS NOT NULL AND
             |    sqrt(list_sum(list_transform(embedding,
             |      x -> x::DOUBLE * x::DOUBLE))) > 0),
             |sims AS (
             |  SELECT a.vec_id, a.label,
             |    b.vec_id AS hard_neg_id, b.label AS hard_neg_label,
             |    list_sum(list_transform(range(1, len(a.embedding) + 1),
             |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
             |    (sqrt(list_sum(list_transform(a.embedding,
             |       x -> x::DOUBLE * x::DOUBLE))) *
             |     sqrt(list_sum(list_transform(b.embedding,
             |       x -> x::DOUBLE * x::DOUBLE)))) AS cs
             |  FROM valid a JOIN valid b ON a.label <> b.label),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY cs DESC, hard_neg_id) AS rn
             |  FROM sims)
             |SELECT vec_id, label, hard_neg_id, hard_neg_label,
             |  round(cs, 4) AS cos_sim
             |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin)
    ),

    // ---- simplified silhouette of the q72 fixed-centroid clustering:
    //      per-cell clustering-quality stats from exact integer distances;
    //      own/other centroid distances via the same (dist, cid) tie rule
    QueryDef(
      "q146_silhouette",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        Similarity.silhouetteQuantized(emb, "vec_id", "embedding", centroids)
      },
      Some("""WITH q AS (SELECT vec_id,
             |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
             |  FROM embeddings),
             |c AS (SELECT vec_id AS cid, vq AS cq FROM q WHERE vec_id < 8),
             |d AS (SELECT q.vec_id, c.cid,
             |  list_sum(list_transform(generate_series(1, 64),
             |    j -> (q.vq[j] - c.cq[j]) * (q.vq[j] - c.cq[j]))) AS dist
             |  FROM q, c),
             |r AS (SELECT vec_id, cid, dist,
             |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             |  FROM d),
             |own AS (SELECT vec_id, cid AS cell, dist AS a FROM r WHERE rn = 1),
             |oth AS (SELECT vec_id, min(dist) AS b FROM r WHERE rn > 1
             |        GROUP BY vec_id),
             |s AS (SELECT own.vec_id, cell,
             |  CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS DOUBLE)
             |       ELSE (CAST(b AS DOUBLE) - CAST(a AS DOUBLE))
             |            / CAST(greatest(a, b) AS DOUBLE) END AS sil
             |  FROM own JOIN oth USING (vec_id))
             |SELECT CAST(cell AS BIGINT) AS cell,
             |  CAST(count(*) AS BIGINT) AS n_vectors,
             |  round(CAST(sum(CAST(round(sil, 9) AS DECIMAL(18,9))) AS DOUBLE)
             |        / count(*), 6) AS mean_sil,
             |  round(min(sil), 6) AS min_sil, round(max(sil), 6) AS max_sil
             |FROM s GROUP BY cell ORDER BY cell""".stripMargin)
    ),

    // ---- the q141 LAKE channel, oracled as a RECALL PIN (the q75
    //      pattern): hard negatives mined through the multi-probe SRP
    //      bucket join (quantized plane family) compared anchor-by-anchor
    //      against the exact cross-product miner — both engines compute
    //      both paths independently, so a drift in bucketing, probe
    //      enumeration, argmax tie-break, or cosine rounding breaks the
    //      hash. Integer outputs only (counts + basis-point cos gap).
    QueryDef(
      "q168_hard_negatives_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val ex = Similarity.hardNegatives(e, "vec_id", "embedding", "label")
          .select(col("vec_id"), col("hard_neg_id").as("_xneg"),
            col("cos_sim").as("_xcs"))
        val lsh = Similarity.hardNegativesLsh(e, "vec_id", "embedding",
            "label", dim = 64, nBits = SemBits, probeHamming = 1,
            portable = true)
          .select(col("vec_id"), col("hard_neg_id").as("_lneg"),
            col("cos_sim").as("_lcs"))
        ex.join(lsh, Seq("vec_id"), "left").agg(
          count(lit(1)).cast("long").as("n_anchors"),
          count(col("_lneg")).cast("long").as("n_lsh"),
          sum(when(col("_lneg") === col("_xneg"), lit(1L)).otherwise(lit(0L)))
            .cast("long").as("n_id_match"),
          coalesce(sum(when(col("_lneg").isNotNull,
            round(col("_xcs") * 10000).cast("long") -
              round(col("_lcs") * 10000).cast("long"))), lit(0L))
            .cast("long").as("cos_gap_bp"))
      },
      Some(hardNegLshOracleSql)
    ),

    // ---- quantized-codebook k-means TRAINING, oracled end-to-end: 3
    //      grid-snapped Lloyd passes (assign = native integer argmin,
    //      update = exact integer sums snapped back to the grid) — the
    //      step that turns q72's "fixed quantizer" into a TRAINED one.
    //      Census: per-cell size, exact integer WCSS, centroid checksums.
    QueryDef(
      "q181_kmeans_codebook",
      (s, dir) => {
        import s.implicits._
        val (assigned, cents) = Similarity.kmeansCodebookQuantized(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, k = KmK, iters = KmIters, bound = KmB.toLong)
        val cm = typedLit(cents.map(_.toSeq).toSeq)
        val centroid = element_at(cm, col("_cell").cast("int") + 1)
        val dist = aggregate(
          zip_with(col("_vq"), centroid, (x, c) => (x - c) * (x - c)),
          lit(0L), (a, x) => a + x)
        val census = assigned
          .select(col("_cell").cast("long").as("cell"), dist.as("_d"))
          .groupBy("cell")
          .agg(count(lit(1)).cast("long").as("n_points"),
            sum(col("_d")).cast("long").as("wcss"))
        val checksums = cents.zipWithIndex
          .map { case (cv, i) =>
            (i.toLong, cv.sum, cv.map(math.abs).sum)
          }.toDF("cell", "c_sum", "c_abs")
        census.join(broadcast(checksums), Seq("cell"))
          .orderBy("cell")
      },
      Some(kmeansOracleSql)
    ),

    // ---- maximal-marginal-relevance re-rank: distributed top-20 pool,
    //      driver greedy (poolSize rows — the codebook-collect pattern),
    //      every cosine the same sequential fold as the twin's list_sum,
    //      so the SELECTION ORDER itself is hash-checked.
    QueryDef(
      "q182_mmr_diverse_topk",
      (s, dir) =>
        Similarity.mmrSelect(t(s, dir, "embeddings"), "vec_id", "embedding",
          queryId = 0L, poolSize = MmrPool, k = MmrK),
      Some(mmrOracleSql)
    ),

    // ---- embedding-level decontamination vs the eval holdout
    //      (vec_id % 97 == 0): multi-probe quantized buckets (q78 shape,
    //      eval side broadcast) → rounded-cosine verify ≥ SemThreshold →
    //      per-corpus-doc hit census with deterministic best-hit pick.
    QueryDef(
      "q183_semantic_decontamination",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.semanticDecontaminate(
          e.filter(col("vec_id") % DeconMod =!= 0),
          e.filter(col("vec_id") % DeconMod === 0),
          "vec_id", "embedding", dim = 64, threshold = SemThreshold,
          nBits = SemBits, probeHamming = 1, portable = true)
      },
      Some(deconOracleSql)
    ),

    // ---- residual quantization encode (the third codebook family after
    //      IVF/PQ): coarse cell + residual code per vector, exact integer
    //      reconstruction error — fully oracled via the q72/q80
    //      fixed-quantizer trick (C1 = 8 lowest-id vectors, C2 = the
    //      residuals of the 16 lowest-id vectors).
    QueryDef(
      "q193_rq_encode",
      (s, dir) =>
        Similarity.rqEncodeCensus(t(s, dir, "embeddings"), "vec_id",
          "embedding", dim = 64, k1 = 8, k2 = 16),
      Some(rqOracleSql)
    ),

    // ---- retrieval-quality EVAL harness over the ANN index: DCG@10 of
    //      the multi-probe LSH k-NN join (q78 machinery) against
    //      label-match graded relevance, with DYADIC rank discounts
    //      2^(1-r) — every weight and cumulative ideal is an exact
    //      decimal rendering of a power of two (the q149 trick), so DCG
    //      sums are exact dyadic rationals in BOTH engines regardless of
    //      summation order, and nDCG is one exact-shape division. The
    //      metric an index tuning loop gates on, fully hash-checked.
    QueryDef(
      "q195_retrieval_dcg",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val topk = Similarity.knnJoin(
          e.filter(col("vec_id") < DcgQueries), e, "vec_id", "embedding",
          k = 10, dim = 64, nBits = SemBits, probeHamming = 1,
          portable = true)
        val lbl = e.select(col("vec_id"), col("label"))
        val weights = typedLit((1 to 10).map(r => math.pow(2.0, 1 - r)))
        val cumW = typedLit((1 to 10).map(j => 2.0 - math.pow(2.0, 1 - j)))
        val gains = topk
          .join(lbl.withColumnRenamed("vec_id", "q_id")
            .withColumnRenamed("label", "_ql"), "q_id")
          .join(lbl.withColumnRenamed("vec_id", "c_id")
            .withColumnRenamed("label", "_cl"), "c_id")
          .withColumn("_g",
            when(col("_ql") === col("_cl"), lit(1L)).otherwise(lit(0L)))
        val perQ = gains.groupBy(col("q_id"), col("_ql"))
          .agg(sum(col("_g")).cast("long").as("n_rel_retrieved"),
            sum(col("_g").cast("double") *
              element_at(weights, col("rank").cast("int"))).as("dcg"))
        val labCnt = e.groupBy("label")
          .agg(count(lit(1)).cast("long").as("_n"))
        perQ
          .join(broadcast(labCnt), col("_ql") === col("label"))
          .withColumn("n_rel", col("_n") - 1)
          .withColumn("_idcg",
            // floor at 1: a query with a UNIQUE label (n_rel = 0) gets
            // idcg = w_1 instead of element_at(..., 0) blowing up —
            // mirrored by the oracle CASE's greatest()
            element_at(cumW,
              least(greatest(col("n_rel"), lit(1L)), lit(10L)).cast("int")))
          .select(col("q_id"), col("n_rel"), col("n_rel_retrieved"),
            col("dcg"), (col("dcg") / col("_idcg")).as("ndcg"))
          .orderBy("q_id")
      },
      Some(retrievalDcgOracleSql)
    ),

    // ---- INCREMENTAL IVF INDEX MAINTENANCE: new vectors are assigned
    //      against the FROZEN quantizer and appended per cell — existing
    //      postings are never re-read or re-assigned (the q186/q194/q203
    //      incremental≡batch pattern applied to the ANN index). The
    //      oracle computes the batch cell census over ALL vectors, so
    //      the hash match proves state⊕delta assignment == full rebuild.
    QueryDef(
      "q212_ivf_incremental_add",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val centroids = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        def assign(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"),
            Similarity.ivfAssignQuantized(col("embedding"), centroids)
              .as("cell"))
        val cut = 250L
        val state = assign(e.filter(col("vec_id") < cut))
          .groupBy("cell").agg(count(lit(1)).as("n"),
            sum(col("vec_id")).as("idsum"))
        val delta = assign(e.filter(col("vec_id") >= cut))
          .groupBy("cell").agg(count(lit(1)).as("n"),
            sum(col("vec_id")).as("idsum"))
        state.unionByName(delta)
          .groupBy("cell")
          .agg(sum(col("n")).cast("long").as("n_vectors"),
            sum(col("idsum")).cast("long").as("id_checksum"))
          .select(col("cell").cast("long").as("cell"), col("n_vectors"),
            col("id_checksum"))
          .orderBy("cell")
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
             |SELECT CAST(cid AS BIGINT) AS cell,
             |  CAST(count(*) AS BIGINT) AS n_vectors,
             |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
             |FROM r WHERE rn = 1
             |GROUP BY cid ORDER BY cell""".stripMargin)
    ),

    // ---- RECALL@K CURVE: the index-tuning sweep behind q75's single
    //      pin — recall of the multi-probe LSH knn-join at k ∈
    //      {1,5,10,20} against per-query brute-force ground truth, all
    //      integer hit counts + one division per k. Completes the eval
    //      family (DCG q195, kappa q205, recall curve q213).
    QueryDef(
      "q213_recall_curve",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sys = Similarity.knnJoin(
          e.filter(col("vec_id") < DcgQueries), e, "vec_id", "embedding",
          k = 20, dim = 64, nBits = SemBits, probeHamming = 1,
          portable = true)
          .select(col("q_id"), col("c_id"), col("rank").as("_sr"))
        val qv = e.filter(col("vec_id") < DcgQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("_qv"))
        val brute = e.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("c_id"),
            round(Similarity.cosine(col("embedding"), col("_qv")), 4)
              .as("_cs"))
          .withColumn("_br", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy(desc("_cs"), asc("c_id"))))
          .filter(col("_br") <= 20)
        val hits = sys.join(brute.select("q_id", "c_id", "_br"),
          Seq("q_id", "c_id"))
        val ks = broadcast(s.createDataFrame(
          Seq(Tuple1(1L), Tuple1(5L), Tuple1(10L), Tuple1(20L)))
          .toDF("k"))
        ks.join(hits, col("_sr") <= col("k") && col("_br") <= col("k"),
            "left")
          .groupBy("k")
          .agg(count(col("q_id")).cast("long").as("n_hits"))
          .select(col("k"), lit(DcgQueries.toLong).as("n_queries"),
            col("n_hits"),
            (col("n_hits").cast("double") /
              (col("k") * DcgQueries).cast("double")).as("recall"))
          .orderBy("k")
      },
      Some(recallCurveOracleSql)
    ),

    // ---- IVF-PQ OPERATING CURVE (r10, VERDICT r9 #7): recall@10 of the
    //      production pqKnnJoin across the tuning grid nProbe ∈ {1,2,4}
    //      (of 8 coarse cells) × codebook size ∈ {4,16} (2-/4-bit codes)
    //      against exact quantized-L2 ground truth — index tuning as
    //      DATA, not folklore: the table shows routing loss (nProbe) and
    //      quantization loss (bits) separately. Every step is exact
    //      integer math; the DuckDB twin replays the full pipeline
    //      (cell routing, per-subspace codeword choice, SDC ranking,
    //      brute-force truth) independently per grid point — recall
    //      numerators are pinned as integers, the one division per row
    //      is fixed-shape. `reach_ceiling` (share of true neighbors in
    //      the PROBED cells) separates routing loss from quantization
    //      loss: on this corpus the ceiling rises with nProbe while
    //      recall stays flat-to-falling — extra probed candidates get
    //      MISRANKED above true neighbors by the coarse codes, so the
    //      curve says "spend bits before probes" (the tuning insight
    //      the table exists to surface).
    QueryDef(
      "q248_ivfpq_operating_curve",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val centroids = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        // ground truth: exact integer-L2 top-k per query over the
        // quantized vectors (materialized _vq attributes — HOF-input rule)
        val vq = e.select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("_vq"))
        val qv = vq.filter(col("vec_id") < DcgQueries)
          .select(col("vec_id").as("q_id"), col("_vq").as("_qq"))
        val brute = vq.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("c_id"),
            // r11: native fused distance (the interpreted zip_with/
            // aggregate chain ran per candidate pair)
            Similarity.qdistL2(col("_qq"), col("_vq")).as("_d"))
          .withColumn("_br", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy(asc("_d"), asc("c_id"))))
          .filter(col("_br") <= CurveK)
          .select("q_id", "c_id")
          .localCheckpoint() // 6 grid points consume it — compute once
        val corpusCells = vq.select(col("vec_id").as("c_id"),
          Similarity.ivfAssignQuantizedLongs(col("_vq"), centroids)
            .as("_ccell"))
        // r11: the six grid points are independent serial chains of small
        // stages — drive them from concurrent driver threads (guide-§2.6
        // back-fill; the q258 recall-curve pattern) and collect only the
        // two counts each; the readout arithmetic stays the identical
        // Spark expressions over a local relation.
        val grid = for {
          kCodes <- CurveCodes
          nProbe <- CurveProbes
        } yield (kCodes, nProbe)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val measured = Await.result(
          Future.traverse(grid) { case (kCodes, nProbe) => Future {
            val cbs = Similarity.pqCodebooksFixed(e, "vec_id", "embedding",
              dim = 64, m = PqM, kCodes = kCodes)
            val nn = Similarity.pqKnnJoin(
              e.filter(col("vec_id") < DcgQueries), e, "vec_id", "embedding",
              k = CurveK, centroids, cbs, nProbe = nProbe)
            val nHits = nn.join(brute, Seq("q_id", "c_id"))
              .agg(count(lit(1)).cast("long").as("n_hits"))
              .head().getLong(0)
            // routing ceiling: true pairs whose corpus cell IS probed —
            // recall ≤ ceiling by construction; the gap is quantization
            val qp = vq.filter(col("vec_id") < DcgQueries)
              .select(col("vec_id").as("q_id"),
                explode(Similarity.ivfProbeCells(col("_vq"), centroids,
                  nProbe)).as("_pcell"))
            val nReach = brute.join(qp, Seq("q_id"))
              .join(corpusCells, Seq("c_id"))
              .filter(col("_ccell") === col("_pcell"))
              .agg(count(lit(1)).cast("long").as("n_reachable"))
              .head().getLong(0)
            (nProbe.toLong,
              java.lang.Long.numberOfTrailingZeros(kCodes.toLong).toLong,
              nHits, nReach)
          }}, Duration.Inf)
        import s.implicits._
        measured.toDF("_np", "_bits", "_nh", "_nr")
          .select(col("_np").as("n_probe"),
            col("_bits").as("pq_bits"),
            lit(CurveK.toLong).as("k"),
            lit(DcgQueries.toLong).as("n_queries"),
            col("_nh").as("n_hits"), col("_nr").as("n_reachable"),
            (col("_nh").cast("double") /
              lit((CurveK * DcgQueries).toDouble)).as("recall"),
            (col("_nr").cast("double") /
              lit((CurveK * DcgQueries).toDouble)).as("reach_ceiling"))
          .orderBy("pq_bits", "n_probe")
      },
      Some(ivfPqCurveOracleSql)
    ),

    // ---- ANNOTATION AGREEMENT (Cohen's kappa) between the gold label
    //      and the 1-NN-imputed label — the label-quality gate an
    //      auto-labeling pipeline runs: po = trace/N (one division of
    //      exact longs), pe = Σ rowᵢ·colᵢ / N² (INTEGER numerator — no
    //      order-dependent double sums), κ = (po−pe)/(1−pe) with 1
    //      written CAST(1 AS DOUBLE) in the twin (decimal-literal trap).
    //      Items whose probe buckets hold no candidate drop out of the
    //      eval identically in both engines.
    QueryDef(
      "q205_label_agreement_kappa",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val nn = Similarity.knnJoin(e, e, "vec_id", "embedding",
          k = 1, dim = 64, nBits = SemBits, probeHamming = 1,
          portable = true)
        kappaFromNn(e, nn)
      },
      Some(kappaOracleSql)
    ),

    // ---- PRODUCTION-SHAPE 1-NN label agreement: the SAME kappa table as
    //      q205 fed from the IVF-PQ channel (pqKnnJoin) — coarse cells
    //      route each query to its 2 nearest of 8 fixed-quantizer cells,
    //      candidates rank by symmetric PQ distance (m integer lookups
    //      into driver-built codeword-pair tables); only codes and cell
    //      ids cross the exchanges, never a vector. Every step is exact
    //      integer math with a DuckDB twin → the whole production path
    //      (routing, codes, SDC, 1-NN ties, kappa) hash-matches. PqKnnSpec
    //      pins agreement vs the exact brute-force channel.
    QueryDef(
      "q214_pq_knn_kappa",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val centroids = e.filter(col("vec_id") < 8).orderBy("vec_id")
          .select(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("cq"))
          .collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        val cbs = Similarity.pqCodebooksFixed(e, "vec_id", "embedding",
          dim = 64, m = PqM, kCodes = PqK)
        val nn = Similarity.pqKnnJoin(e, e, "vec_id", "embedding",
          k = 1, centroids, cbs, nProbe = 2)
        kappaFromNn(e, nn)
      },
      Some(pqKappaOracleSql)
    ),

    // ---- GRAPH-BASED ANN (r11, VERDICT r10 #5): beam search over a
    //      degree-capped kNN graph — the HNSW-class index family the
    //      LSH/IVF/PQ lineup lacked. The exact degree-6 graph (integer-
    //      quantized L2, id tie-breaks) is the index; queries advance in
    //      SYNCHRONIZED fixed-step rounds: each hop expands the beam's
    //      out-edges through one equi-join and keeps the best `ef` per
    //      query; recall@10 vs brute force reported per beam width 2/4/8
    //      (the q248 operating-curve pattern). Every step is integer/
    //      rational → the oracle replays graph build + all hops + recall
    //      as unrolled CTEs. The all-pairs graph build is the ORACLE
    //      channel; x258 sweeps the bucketed production build at 100×.
    QueryDef(
      "q258_graph_ann_beam",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val graph = Similarity.knnGraphExact(e, "vec_id", "embedding",
            BeamDegree)
          .localCheckpoint() // reused by all three beam widths
        Similarity.beamRecallCurve(e, "vec_id", "embedding", graph,
          col("vec_id") < BeamNq, k = BeamK, efs = BeamEfs,
          hops = BeamHops, entryId = 0L)
      },
      Some(beamAnnOracleSql)
    ),

    // ---- EMBEDDING CENTROID DRIFT: per-label cosine between the mean
    //      vectors of two corpus snapshots (even/odd vec_id halves stand
    //      in for model-v1/model-v2 exports) — the monitor run after an
    //      embedding-model swap. cos is scale-invariant so it is computed
    //      on integer-quantized component SUMS (never a mean): exact
    //      order-independent longs into width-37 DECIMAL cross-products,
    //      one fixed-shape double readout. Shuffles carry |groups|·dim
    //      counters, never vectors.
    QueryDef(
      "q216_centroid_drift",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.centroidDrift(
          e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
          "label", "embedding")
      },
      Some(centroidDriftOracleSql)
    ),

    // ---- MEAN RECIPROCAL RANK of label-relevant retrieval over the
    //      brute-force ranking (the q213 eval-harness query set): rank of
    //      the first same-label candidate per query, reciprocal ranks
    //      rounded to 6 dp and summed as DECIMAL (order-independent), the
    //      MRR one exact-shape division. Completes the retrieval-eval
    //      family (DCG q195, recall q213, kappa q205/q214).
    QueryDef(
      "q217_retrieval_mrr",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qv = e.filter(col("vec_id") < DcgQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("_qv"),
            col("label").as("_ql"))
        val ranked = e.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("_ql"), col("vec_id").as("c_id"),
            col("label").as("_cl"),
            round(Similarity.cosine(col("embedding"), col("_qv")), 4).as("_cs"))
          .withColumn("_r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy(desc("_cs"), asc("c_id"))))
        val firstRel = ranked.filter(col("_cl") === col("_ql"))
          .groupBy("q_id").agg(min(col("_r")).cast("long").as("first_rel_rank"))
        val perQ = qv.select(col("q_id"))
          .join(firstRel, Seq("q_id"), "left")
          .withColumn("first_rel_rank",
            coalesce(col("first_rel_rank"), lit(0L)))
          .withColumn("_rrd",
            when(col("first_rel_rank") === 0, lit(0.0))
              .otherwise(round(lit(1.0).cast("double") /
                col("first_rel_rank").cast("double"), 6))
              .cast(DecimalType(10, 6)))
        val tot = broadcast(perQ.agg(sum(col("_rrd")).as("_srr"),
          count(lit(1)).cast("long").as("_nq")))
        perQ.crossJoin(tot)
          .select(col("q_id"), col("first_rel_rank"),
            col("_rrd").cast("double").as("reciprocal_rank"),
            (col("_srr").cast("double") / col("_nq").cast("double")).as("mrr"))
          .orderBy("q_id")
      },
      Some(mrrOracleSql)
    ),

    // ---- label-noise detection (confident-learning heuristic): per label,
    //      how many points have a strict MAJORITY of their k=5 bucketed
    //      nearest neighbors carrying a different label. The q78 kNN
    //      machinery end-to-end — the oracle re-derives buckets, probes,
    //      ranks, then the disagreement census
    QueryDef(
      "q229_label_noise_knn",
      (s, dir) =>
        Similarity.labelNoiseByNeighbors(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label",
          k = 5, dim = 64, nBits = SemBits, probeHamming = 1,
          portable = true),
      Some(labelNoiseOracleSql)
    )
  )

  /** Cohen's kappa between the gold label and the 1-NN-imputed label — the
    * shared tail of q205/q214: any (q_id, c_id) pair set joins the label
    * table twice, the confusion table is checkpointed once, and po/pe/κ
    * are single divisions of integer-exact numerators.
    */
  private def kappaFromNn(
      e: org.apache.spark.sql.DataFrame,
      nn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val lbl = e.select(col("vec_id"), col("label"))
    val pairs = nn
      .join(lbl.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "_a"), "q_id")
      .join(lbl.withColumnRenamed("vec_id", "c_id")
        .withColumnRenamed("label", "_b"), "c_id")
      .select(col("_a"), col("_b"))
      .localCheckpoint(true)
    val conf = pairs.groupBy("_a", "_b")
      .agg(count(lit(1)).cast("long").as("_n"))
      .localCheckpoint(true)
    val totals = conf.agg(sum(col("_n")).cast("long").as("n_items"),
      sum(when(col("_a") === col("_b"), col("_n")).otherwise(0L))
        .cast("long").as("n_agree"))
    val rows = conf.groupBy(col("_a").as("_l"))
      .agg(sum(col("_n")).cast("long").as("_r"))
    val cols_ = conf.groupBy(col("_b").as("_l"))
      .agg(sum(col("_n")).cast("long").as("_c"))
    val s2 = rows.join(cols_, Seq("_l"))
      .agg(sum(col("_r") * col("_c")).cast("long").as("_s"))
    totals.crossJoin(s2)
      .select(col("n_items"), col("n_agree"),
        (col("n_agree").cast("double") / col("n_items").cast("double"))
          .as("po"),
        (col("_s").cast("double") /
          (col("n_items") * col("n_items")).cast("double")).as("pe"))
      .select(col("n_items"), col("n_agree"), col("po"), col("pe"),
        ((col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
  }

  /** The q193 oracle: stage-1 argmin (q72's row_number pattern), residual
    * lists, stage-2 argmin against the 16 lowest-id residuals, census
    * with exact integer reconstruction error.
    */
  private def rqOracleSql: String = {
    val d1 =
      "list_sum(list_transform(generate_series(1, 64), " +
        "j -> (q.vq[j] - c.cv[j]) * (q.vq[j] - c.cv[j])))"
    val d2 =
      "list_sum(list_transform(generate_series(1, 64), " +
        "j -> (r1.rd[j] - c2.rd[j]) * (r1.rd[j] - c2.rd[j])))"
    s"""WITH q AS (SELECT vec_id,
       |    list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |c1 AS (SELECT vec_id AS cell, vq AS cv FROM q WHERE vec_id < 8),
       |d1 AS (SELECT q.vec_id, q.vq, c.cell, $d1 AS dd
       |  FROM q CROSS JOIN c1 c),
       |a1 AS (SELECT vec_id, vq, cell FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn
       |  FROM d1) WHERE rn = 1),
       |r1 AS (SELECT a1.vec_id, a1.cell AS cell1,
       |    list_transform(generate_series(1, 64), j -> a1.vq[j] - c.cv[j]) AS rd
       |  FROM a1 JOIN c1 c ON c.cell = a1.cell),
       |c2 AS (SELECT vec_id AS code, rd FROM r1 WHERE vec_id < 16),
       |d2 AS (SELECT r1.vec_id, r1.cell1, c2.code, $d2 AS dd
       |  FROM r1 CROSS JOIN c2),
       |a2 AS (SELECT vec_id, cell1, code, dd FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, code) AS rn
       |  FROM d2) WHERE rn = 1)
       |SELECT cell1::BIGINT AS cell1, code::BIGINT AS cell2,
       |  count(*) AS n_vecs, sum(dd)::BIGINT AS recon_err
       |FROM a2 GROUP BY 1, 2 ORDER BY cell1, cell2""".stripMargin
  }

  /** The q168 oracle: BOTH hard-negative paths in DuckDB — the exact
    * cross-product miner (q141's CTEs) and the multi-probe bucket channel
    * (q78's bucket/probe CTEs + the cross-label filter) — then the recall
    * pin: anchor counts, id-match count, and the summed basis-point gap
    * between the exact and LSH winners' rounded cosines (pure integers).
    */
  private def hardNegLshOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i).toSeq)
      .mkString("[", ",", "]")
    def cos(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, len($a) + 1),
         |    i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) /
         |  (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) *
         |   sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE))))""".stripMargin
    s"""WITH valid AS (
       |  SELECT vec_id, label, embedding FROM embeddings
       |  WHERE embedding IS NOT NULL AND
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> x::DOUBLE * x::DOUBLE))) > 0),
       |sims AS (
       |  SELECT a.vec_id, b.vec_id AS hard_neg_id,
       |    ${cos("a.embedding", "b.embedding")} AS cs
       |  FROM valid a JOIN valid b ON a.label <> b.label),
       |ex AS (SELECT vec_id, hard_neg_id, round(cs, 4) AS cs4 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cs DESC, hard_neg_id) AS rn FROM sims) r WHERE rn = 1),
       |vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM valid),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |probes AS (SELECT q.vec_id AS q_id, xor(q.bucket, m.m) AS bucket
       |  FROM b q, (SELECT unnest($masks::BIGINT[]) AS m) m),
       |lsims AS (
       |  SELECT p.q_id AS vec_id, c.vec_id AS hard_neg_id,
       |    ${cos("va.embedding", "vc.embedding")} AS cs
       |  FROM probes p
       |  JOIN b c ON c.bucket = p.bucket
       |  JOIN valid va ON va.vec_id = p.q_id
       |  JOIN valid vc ON vc.vec_id = c.vec_id
       |  WHERE va.label <> vc.label),
       |lsh AS (SELECT vec_id, hard_neg_id, round(cs, 4) AS cs4 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cs DESC, hard_neg_id) AS rn FROM lsims) r WHERE rn = 1)
       |SELECT
       |  CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_anchors,
       |  CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
       |  CAST((SELECT count(*) FROM ex JOIN lsh USING (vec_id)
       |    WHERE ex.hard_neg_id = lsh.hard_neg_id) AS BIGINT) AS n_id_match,
       |  CAST((SELECT coalesce(sum(
       |      CAST(round(ex.cs4 * 10000) AS BIGINT) -
       |      CAST(round(lsh.cs4 * 10000) AS BIGINT)), 0)
       |    FROM ex JOIN lsh USING (vec_id)) AS BIGINT) AS cos_gap_bp""".stripMargin
  }

  /** The q77 oracle: the full semantic-dedup pipeline in DuckDB — quantized
    * SRP buckets (same integer plane family as q70), bucket-local candidate
    * pairs, rounded-cosine verification, and the min-label connected
    * components as a RECURSIVE CTE (`reach` enumerates every label that can
    * reach a node; min per node = the component minimum — the same fixpoint
    * Spark's iterative propagation converges to). Survivors = ids that are
    * their own component minimum (or in no pair at all).
    */
  private def semanticDedupOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    def cos(a: String, b: String): String =
      s"""round(list_sum(list_transform(range(1, len($a) + 1),
         |    i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) /
         |  (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) *
         |   sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE)))), 4)""".stripMargin
    s"""WITH RECURSIVE vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |pairs AS (
       |  SELECT a.vec_id AS ida, c.vec_id AS idb
       |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = c.vec_id
       |  WHERE ${cos("ea.embedding", "eb.embedding")} >= $SemThreshold),
       |edges AS (SELECT ida AS src, idb AS dst FROM pairs
       |  UNION SELECT idb, ida FROM pairs),
       |reach(node, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
       |labels AS (SELECT node, min(label) AS cl FROM reach GROUP BY node)
       |SELECT e.vec_id FROM embeddings e
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM labels l WHERE l.node = e.vec_id AND l.cl <> e.vec_id)
       |ORDER BY vec_id""".stripMargin
  }

  /** Shared CTE prefix for the PQ oracles: quantized vectors, the fixed
    * codebook rows, and the per-(vector, subspace) nearest-codeword choice
    * (row_number ordered by exact integer subspace L2, ties to lowest
    * codeword id — the same tie rule as ivf_argmin).
    */
  private def pqChosenCtes: String = {
    val d = 64 / PqM
    s"""vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |cb AS (SELECT vec_id AS c, vq FROM vq WHERE vec_id < $PqK),
       |per_sub AS (
       |  SELECT v.vec_id, sub.s_idx, c.c,
       |    row_number() OVER (PARTITION BY v.vec_id, sub.s_idx ORDER BY
       |      list_sum(list_transform(range(1, ${d + 1}),
       |        j -> (v.vq[sub.s_idx * $d + j] - c.vq[sub.s_idx * $d + j]) *
       |             (v.vq[sub.s_idx * $d + j] - c.vq[sub.s_idx * $d + j]))),
       |      c.c) AS rn
       |  FROM vq v, (SELECT unnest(range(0, $PqM)) AS s_idx) sub, cb c),
       |chosen AS (SELECT vec_id, s_idx, c FROM per_sub WHERE rn = 1)""".stripMargin
  }

  private def pqCodesOracleSql: String = {
    val cols = (0 until PqM)
      .map(s => s"codes[${s + 1}] AS c$s").mkString(", ")
    s"""WITH ${pqChosenCtes},
       |codes AS (SELECT vec_id, list(c ORDER BY s_idx) AS codes
       |  FROM chosen GROUP BY vec_id)
       |SELECT vec_id, $cols FROM codes ORDER BY vec_id""".stripMargin
  }

  private def pqAdcOracleSql: String = {
    val d = 64 / PqM
    s"""WITH ${pqChosenCtes},
       |q AS (SELECT vq FROM vq WHERE vec_id = 0)
       |SELECT ch.vec_id, CAST(sum(
       |    list_sum(list_transform(range(1, ${d + 1}),
       |      j -> (q.vq[ch.s_idx * $d + j] - c.vq[ch.s_idx * $d + j]) *
       |           (q.vq[ch.s_idx * $d + j] - c.vq[ch.s_idx * $d + j])))
       |  ) AS BIGINT) AS adc
       |FROM chosen ch JOIN cb c ON c.c = ch.c, q
       |WHERE ch.vec_id <> 0
       |GROUP BY ch.vec_id ORDER BY adc, ch.vec_id LIMIT 10""".stripMargin
  }

  /** The q82 oracle: IVF cell routing (q72's assign/qcell CTEs) composed
    * with PQ ADC ranking (q81's chosen/adc CTEs) — all exact integer math.
    */
  private def ivfPqOracleSql: String = {
    val d = 64 / PqM
    s"""WITH ${pqChosenCtes},
       |c8 AS (SELECT vec_id AS cid, vq AS cq FROM vq WHERE vec_id < 8),
       |qcell AS (SELECT cid FROM (
       |  SELECT c.cid, list_sum(list_transform(generate_series(1, 64),
       |    j -> (q.vq[j] - c.cq[j]) * (q.vq[j] - c.cq[j]))) AS dist
       |  FROM vq q, c8 c WHERE q.vec_id = 0 ORDER BY dist, cid LIMIT 3) y),
       |assign AS (SELECT vec_id, cell FROM (
       |  SELECT v.vec_id, c.cid AS cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, 64),
       |        j -> (v.vq[j] - c.cq[j]) * (v.vq[j] - c.cq[j]))), c.cid) AS rn
       |  FROM vq v, c8 c) z WHERE rn = 1),
       |q AS (SELECT vq FROM vq WHERE vec_id = 0)
       |SELECT ch.vec_id, CAST(sum(
       |    list_sum(list_transform(range(1, ${d + 1}),
       |      j -> (q.vq[ch.s_idx * $d + j] - c.vq[ch.s_idx * $d + j]) *
       |           (q.vq[ch.s_idx * $d + j] - c.vq[ch.s_idx * $d + j])))
       |  ) AS BIGINT) AS adc
       |FROM chosen ch JOIN cb c ON c.c = ch.c, q
       |WHERE ch.vec_id <> 0
       |  AND ch.vec_id IN (SELECT a.vec_id FROM assign a
       |    WHERE a.cell IN (SELECT cid FROM qcell))
       |GROUP BY ch.vec_id ORDER BY adc, ch.vec_id LIMIT 10""".stripMargin
  }

  /** The q78 oracle: the batch k-NN join in DuckDB — same quantized SRP
    * buckets (q70 family, [[SemBits]] bits), the query side unnested into
    * its XOR probe masks (own bucket + each single-bit flip), bucket
    * equi-join, rounded cosine, row_number per query.
    */
  private def knnJoinOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i).toSeq)
      .mkString("[", ",", "]")
    s"""WITH vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |probes AS (SELECT q.vec_id AS q_id, xor(q.bucket, m.m) AS bucket
       |  FROM b q, (SELECT unnest($masks::BIGINT[]) AS m) m
       |  WHERE q.vec_id < 20),
       |cand AS (SELECT p.q_id, c.vec_id AS c_id
       |  FROM probes p JOIN b c ON c.bucket = p.bucket
       |  WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT q_id, c_id,
       |  round(list_sum(list_transform(range(1, len(eq.embedding) + 1),
       |      i -> eq.embedding[i]::DOUBLE * ec.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(eq.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(ec.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cos_sim
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.q_id
       |  JOIN embeddings ec ON ec.vec_id = cand.c_id)
       |SELECT q_id, c_id, cos_sim, rank FROM (
       |  SELECT q_id, c_id, cos_sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id)
       |      AS rank
       |  FROM sims) r
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  /** The q229 oracle: the q78 knn-join pipeline over ALL points at k=5,
    * then per-point neighbor-label disagreement and the per-label suspect
    * census (strict majority = 2·n_disagree > n_nbrs, integers only until
    * the two rounded rate divisions).
    */
  private def labelNoiseOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i).toSeq)
      .mkString("[", ",", "]")
    s"""WITH vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |probes AS (SELECT q.vec_id AS q_id, xor(q.bucket, m.m) AS bucket
       |  FROM b q, (SELECT unnest($masks::BIGINT[]) AS m) m),
       |cand AS (SELECT p.q_id, c.vec_id AS c_id
       |  FROM probes p JOIN b c ON c.bucket = p.bucket
       |  WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT q_id, c_id,
       |  round(list_sum(list_transform(range(1, len(eq.embedding) + 1),
       |      i -> eq.embedding[i]::DOUBLE * ec.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(eq.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(ec.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cos_sim
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.q_id
       |  JOIN embeddings ec ON ec.vec_id = cand.c_id),
       |topk AS (SELECT q_id, c_id FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id)
       |      AS rank
       |  FROM sims) r WHERE rank <= 5),
       |per AS (SELECT t.q_id, lq.label AS label_q,
       |    CAST(count(*) AS BIGINT) AS n_nbrs,
       |    CAST(coalesce(sum(CASE WHEN lc.label <> lq.label THEN 1 END), 0)
       |      AS BIGINT) AS n_disagree
       |  FROM topk t
       |  JOIN embeddings lq ON lq.vec_id = t.q_id
       |  JOIN embeddings lc ON lc.vec_id = t.c_id
       |  GROUP BY 1, 2)
       |SELECT label_q AS label, CAST(count(*) AS BIGINT) AS n_scored,
       |  CAST(coalesce(sum(CASE WHEN 2 * n_disagree > n_nbrs THEN 1 END), 0)
       |    AS BIGINT) AS n_suspect,
       |  round(CAST(coalesce(sum(CASE WHEN 2 * n_disagree > n_nbrs THEN 1 END),
       |      0) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS suspect_rate,
       |  round(CAST(sum(n_disagree) AS DOUBLE) / CAST(sum(n_nbrs) AS DOUBLE),
       |    6) AS disagree_rate
       |FROM per GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The q195 oracle: the q78 knn-join pipeline (quantized planes,
    * multi-probe buckets, rounded cosine, per-query rank) at k=10 over
    * queries vec_id < DcgQueries, then DCG with the dyadic 2^(1-r)
    * discounts inlined as EXACT decimal literals (never runtime pow) —
    * sum order cannot matter because every partial sum of dyadics in
    * [2^-9, 1] is exactly representable.
    */
  private def retrievalDcgOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i).toSeq)
      .mkString("[", ",", "]")
    def d(v: Double): String = BigDecimal(v).toString
    val wCase = (1 to 10)
      .map(r => s"WHEN $r THEN ${d(math.pow(2.0, 1 - r))}")
      .mkString("CASE rank ", " ", " END")
    val cumCase = (1 to 10)
      .map(j => s"WHEN $j THEN ${d(2.0 - math.pow(2.0, 1 - j))}")
      .mkString("CASE least(greatest(lc.n - 1, 1), 10) ", " ",
        " ELSE 1.998046875 END")
    s"""WITH vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |probes AS (SELECT q.vec_id AS q_id, xor(q.bucket, m.m) AS bucket
       |  FROM b q, (SELECT unnest($masks::BIGINT[]) AS m) m
       |  WHERE q.vec_id < $DcgQueries),
       |cand AS (SELECT p.q_id, c.vec_id AS c_id
       |  FROM probes p JOIN b c ON c.bucket = p.bucket
       |  WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT q_id, c_id,
       |  round(list_sum(list_transform(range(1, len(eq.embedding) + 1),
       |      i -> eq.embedding[i]::DOUBLE * ec.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(eq.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(ec.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cos_sim
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.q_id
       |  JOIN embeddings ec ON ec.vec_id = cand.c_id),
       |topk AS (SELECT q_id, c_id, rank FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id)
       |      AS rank
       |  FROM sims) r WHERE rank <= 10),
       |g AS (SELECT t.q_id, lq.label AS ql,
       |    CASE WHEN lq.label = lc2.label THEN 1 ELSE 0 END AS g, t.rank
       |  FROM topk t
       |  JOIN embeddings lq ON lq.vec_id = t.q_id
       |  JOIN embeddings lc2 ON lc2.vec_id = t.c_id),
       |perq AS (SELECT q_id, ql,
       |    CAST(sum(g) AS BIGINT) AS n_rel_retrieved,
       |    sum(CAST(g AS DOUBLE) * CAST($wCase AS DOUBLE)) AS dcg
       |  FROM g GROUP BY q_id, ql),
       |lc AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
       |SELECT q_id, CAST(lc.n - 1 AS BIGINT) AS n_rel, n_rel_retrieved,
       |  dcg, dcg / CAST($cumCase AS DOUBLE) AS ndcg
       |FROM perq JOIN lc ON lc.label = perq.ql
       |ORDER BY q_id""".stripMargin
  }

  /** The q213 oracle: the q78 knn pipeline at k=20 over queries
    * vec_id < DcgQueries, per-query brute-force top-20 ground truth, and
    * the k-sweep of prefix-intersection hit counts.
    */
  /** q216: centroid drift on quantized component sums — cos scale-
    * invariance lets both engines stay in exact integer/DECIMAL math up
    * to one fixed-shape double readout. DuckDB sums cast ::DECIMAL(18,0)
    * BEFORE the cross-multiply (the sum(BIGINT)→HUGEINT trap), and the
    * ver split uses vec_id % 2 on non-negative ids (no // sign trap).
    */
  private def centroidDriftOracleSql: String =
    s"""WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS g,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL),
       |s AS (SELECT g, vec_id % 2 AS ver, r.j,
       |    CAST(sum(vq[r.j]) AS DECIMAL(18,0)) AS sj
       |  FROM q, range(1, 65) r(j) GROUP BY 1, 2, 3),
       |x AS (SELECT a.g,
       |    sum(a.sj * b.sj) AS dot,
       |    sum(a.sj * a.sj) AS a2,
       |    sum(b.sj * b.sj) AS b2
       |  FROM s a JOIN s b ON a.g = b.g AND a.j = b.j
       |  WHERE a.ver = 0 AND b.ver = 1
       |  GROUP BY a.g),
       |c AS (SELECT g, vec_id % 2 AS ver, CAST(count(*) AS BIGINT) AS n
       |  FROM q GROUP BY 1, 2)
       |SELECT x.g AS label, c0.n AS n_v1, c1.n AS n_v2,
       |  CASE WHEN x.a2 = 0 OR x.b2 = 0 THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(x.dot AS DOUBLE) /
       |         (sqrt(CAST(x.a2 AS DOUBLE)) * sqrt(CAST(x.b2 AS DOUBLE)))
       |  END AS centroid_cos
       |FROM x
       |JOIN c c0 ON c0.g = x.g AND c0.ver = 0
       |JOIN c c1 ON c1.g = x.g AND c1.ver = 1
       |ORDER BY label""".stripMargin

  /** q217: MRR over the brute-force label-relevant ranking — the bcos/
    * ranking CTEs mirror q213's (sequential-fold cosine, 4-dp rounding,
    * (cs DESC, c_id) tie-break); reciprocal ranks rounded to 6 dp and
    * summed as DECIMAL so the MRR numerator is order-independent.
    */
  private def mrrOracleSql: String =
    s"""WITH bcos AS (SELECT q.vec_id AS q_id, q.label AS ql,
       |  e.vec_id AS c_id, e.label AS cl,
       |  round(list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> e.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cs
       |  FROM embeddings e, embeddings q
       |  WHERE q.vec_id < $DcgQueries AND e.vec_id <> q.vec_id),
       |ranked AS (SELECT q_id, ql, c_id, cl,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, c_id) AS r
       |  FROM bcos),
       |fr AS (SELECT q_id, CAST(min(r) AS BIGINT) AS frr
       |  FROM ranked WHERE cl = ql GROUP BY q_id),
       |per AS (SELECT q.vec_id AS q_id,
       |  coalesce(fr.frr, 0) AS first_rel_rank,
       |  CAST(CASE WHEN coalesce(fr.frr, 0) = 0 THEN CAST(0 AS DOUBLE)
       |       ELSE round(CAST(1 AS DOUBLE) / CAST(fr.frr AS DOUBLE), 6)
       |  END AS DECIMAL(10,6)) AS rrd
       |  FROM embeddings q LEFT JOIN fr ON fr.q_id = q.vec_id
       |  WHERE q.vec_id < $DcgQueries),
       |tot AS (SELECT sum(rrd) AS srr, CAST(count(*) AS BIGINT) AS nq FROM per)
       |SELECT per.q_id, CAST(per.first_rel_rank AS BIGINT) AS first_rel_rank,
       |  CAST(per.rrd AS DOUBLE) AS reciprocal_rank,
       |  CAST(tot.srr AS DOUBLE) / CAST(tot.nq AS DOUBLE) AS mrr
       |FROM per CROSS JOIN tot ORDER BY q_id""".stripMargin

  private def recallCurveOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i).toSeq)
      .mkString("[", ",", "]")
    s"""WITH vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |probes AS (SELECT q.vec_id AS q_id, xor(q.bucket, m.m) AS bucket
       |  FROM b q, (SELECT unnest($masks::BIGINT[]) AS m) m
       |  WHERE q.vec_id < $DcgQueries),
       |cand AS (SELECT p.q_id, c.vec_id AS c_id
       |  FROM probes p JOIN b c ON c.bucket = p.bucket
       |  WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT q_id, c_id,
       |  round(list_sum(list_transform(range(1, len(eq.embedding) + 1),
       |      i -> eq.embedding[i]::DOUBLE * ec.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(eq.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(ec.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cos_sim
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.q_id
       |  JOIN embeddings ec ON ec.vec_id = cand.c_id),
       |sys AS (SELECT q_id, c_id, sr FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id)
       |      AS sr
       |  FROM sims) r WHERE sr <= 20),
       |bcos AS (SELECT q.vec_id AS q_id, e.vec_id AS c_id,
       |  round(list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> e.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cs
       |  FROM embeddings e, embeddings q
       |  WHERE q.vec_id < $DcgQueries AND e.vec_id <> q.vec_id),
       |brute AS (SELECT q_id, c_id, br FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, c_id)
       |      AS br
       |  FROM bcos) r WHERE br <= 20),
       |hits AS (SELECT s.q_id, s.sr, b2.br
       |  FROM sys s JOIN brute b2 ON b2.q_id = s.q_id AND b2.c_id = s.c_id),
       |ks(k) AS (VALUES (1), (5), (10), (20))
       |SELECT CAST(ks.k AS BIGINT) AS k,
       |  CAST($DcgQueries AS BIGINT) AS n_queries,
       |  CAST(count(hits.q_id) AS BIGINT) AS n_hits,
       |  CAST(count(hits.q_id) AS DOUBLE) /
       |    CAST(ks.k * $DcgQueries AS DOUBLE) AS recall
       |FROM ks LEFT JOIN hits ON hits.sr <= ks.k AND hits.br <= ks.k
       |GROUP BY ks.k ORDER BY k""".stripMargin
  }

  /** The q205 oracle: the q78 knn pipeline at k=1 over EVERY vector, then
    * Cohen's kappa from the confusion counts with integer-exact numerators.
    */
  private def kappaOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i).toSeq)
      .mkString("[", ",", "]")
    s"""WITH vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM vq),
       |probes AS (SELECT q.vec_id AS q_id, xor(q.bucket, m.m) AS bucket
       |  FROM b q, (SELECT unnest($masks::BIGINT[]) AS m) m),
       |cand AS (SELECT p.q_id, c.vec_id AS c_id
       |  FROM probes p JOIN b c ON c.bucket = p.bucket
       |  WHERE c.vec_id <> p.q_id),
       |sims AS (SELECT q_id, c_id,
       |  round(list_sum(list_transform(range(1, len(eq.embedding) + 1),
       |      i -> eq.embedding[i]::DOUBLE * ec.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(eq.embedding, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform(ec.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)
       |    AS cos_sim
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.q_id
       |  JOIN embeddings ec ON ec.vec_id = cand.c_id),
       |nn AS (SELECT q_id, c_id FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id)
       |      AS rank
       |  FROM sims) r WHERE rank = 1),
       |$kappaTailSql""".stripMargin
  }

  /** Shared kappa tail (q205/q214): confusion table from any `nn` CTE of
    * (q_id, c_id) pairs, po/pe/κ from integer-exact numerators.
    */
  private def kappaTailSql: String =
    """pairs AS (SELECT la.label AS a, lb.label AS b2
      |  FROM nn
      |  JOIN embeddings la ON la.vec_id = nn.q_id
      |  JOIN embeddings lb ON lb.vec_id = nn.c_id),
      |conf AS (SELECT a, b2, count(*) AS n FROM pairs GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_items,
      |    CAST(sum(CASE WHEN a = b2 THEN n ELSE 0 END) AS BIGINT)
      |      AS n_agree
      |  FROM conf),
      |r AS (SELECT a AS l, CAST(sum(n) AS BIGINT) AS rr FROM conf
      |  GROUP BY 1),
      |c AS (SELECT b2 AS l, CAST(sum(n) AS BIGINT) AS cc FROM conf
      |  GROUP BY 1),
      |s AS (SELECT CAST(sum(rr * cc) AS BIGINT) AS ss
      |  FROM r JOIN c USING (l)),
      |o AS (SELECT n_items, n_agree,
      |    CAST(n_agree AS DOUBLE) / CAST(n_items AS DOUBLE) AS po,
      |    CAST(ss AS DOUBLE) / CAST(n_items * n_items AS DOUBLE) AS pe
      |  FROM tot, s)
      |SELECT n_items, n_agree, po, pe,
      |  (po - pe) / (CAST(1 AS DOUBLE) - pe) AS kappa
      |FROM o""".stripMargin

  /** The q214 oracle: IVF-PQ 1-NN in DuckDB — fixed 8-cell routing (q82's
    * assign CTE, extended to rn<=2 probe cells per query), PQ codes (the
    * shared chosen CTE), SDC distances recomputed from the codebook-pair
    * table (16·16·8 subspace L2²s — the twin RECOMPUTES what Spark ships
    * as a driver literal), 1-NN ties (dist, c_id), then the shared kappa
    * tail.
    */
  private def pqKappaOracleSql: String = {
    val d = 64 / PqM
    s"""WITH ${pqChosenCtes},
       |c8 AS (SELECT vec_id AS cid, vq AS cq FROM vq WHERE vec_id < 8),
       |cdist AS (SELECT v.vec_id, c.cid,
       |    list_sum(list_transform(generate_series(1, 64),
       |      j -> (v.vq[j] - c.cq[j]) * (v.vq[j] - c.cq[j]))) AS cd,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, 64),
       |        j -> (v.vq[j] - c.cq[j]) * (v.vq[j] - c.cq[j]))), c.cid) AS rn
       |  FROM vq v, c8 c),
       |assign AS (SELECT vec_id, cid AS cell FROM cdist WHERE rn = 1),
       |qprobe AS (SELECT vec_id AS q_id, cid AS cell FROM cdist
       |  WHERE rn <= 2),
       |cand AS (SELECT p.q_id, a.vec_id AS c_id
       |  FROM qprobe p JOIN assign a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.q_id),
       |sdct AS (SELECT sub.s_idx, a.c AS ca, b.c AS cb2,
       |    CAST(list_sum(list_transform(range(1, ${d + 1}),
       |      j -> (a.vq[sub.s_idx * $d + j] - b.vq[sub.s_idx * $d + j]) *
       |           (a.vq[sub.s_idx * $d + j] - b.vq[sub.s_idx * $d + j])))
       |      AS BIGINT) AS dd
       |  FROM cb a, cb b, (SELECT unnest(range(0, $PqM)) AS s_idx) sub),
       |dist AS (SELECT cand.q_id, cand.c_id, CAST(sum(t.dd) AS BIGINT) AS dist
       |  FROM cand
       |  JOIN chosen qch ON qch.vec_id = cand.q_id
       |  JOIN chosen cch ON cch.vec_id = cand.c_id AND cch.s_idx = qch.s_idx
       |  JOIN sdct t ON t.s_idx = qch.s_idx AND t.ca = qch.c AND t.cb2 = cch.c
       |  GROUP BY 1, 2),
       |nn AS (SELECT q_id, c_id FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rank
       |  FROM dist) z WHERE rank = 1),
       |$kappaTailSql""".stripMargin
  }

  /** The q248 oracle: the ENTIRE IVF-PQ operating grid replayed in
    * DuckDB — shared quantized vectors, 8-cell routing ranks, exact
    * brute-force top-k truth, then per codebook size its own
    * codeword-choice + SDC-table CTEs (all MATERIALIZED — the r9
    * exponential-CTE-chain lesson), and one SELECT per (nProbe, bits)
    * point UNION ALL'd into the curve.
    */
  private def ivfPqCurveOracleSql: String = {
    val d = 64 / PqM
    val perCode = CurveCodes.map { kc =>
      s"""cb$kc AS (SELECT vec_id AS c, vq FROM vq WHERE vec_id < $kc),
         |per_sub$kc AS MATERIALIZED (
         |  SELECT v.vec_id, sub.s_idx, c.c,
         |    row_number() OVER (PARTITION BY v.vec_id, sub.s_idx ORDER BY
         |      list_sum(list_transform(range(1, ${d + 1}),
         |        j -> (v.vq[sub.s_idx * $d + j] - c.vq[sub.s_idx * $d + j]) *
         |             (v.vq[sub.s_idx * $d + j] - c.vq[sub.s_idx * $d + j]))),
         |      c.c) AS rn
         |  FROM vq v, (SELECT unnest(range(0, $PqM)) AS s_idx) sub, cb$kc c),
         |chosen$kc AS MATERIALIZED (
         |  SELECT vec_id, s_idx, c FROM per_sub$kc WHERE rn = 1),
         |sdct$kc AS MATERIALIZED (
         |  SELECT sub.s_idx, a.c AS ca, b.c AS cb2,
         |    CAST(list_sum(list_transform(range(1, ${d + 1}),
         |      j -> (a.vq[sub.s_idx * $d + j] - b.vq[sub.s_idx * $d + j]) *
         |           (a.vq[sub.s_idx * $d + j] - b.vq[sub.s_idx * $d + j])))
         |      AS BIGINT) AS dd
         |  FROM cb$kc a, cb$kc b,
         |    (SELECT unnest(range(0, $PqM)) AS s_idx) sub)""".stripMargin
    }.mkString(",\n")
    val points = (for {
      kc <- CurveCodes
      np <- CurveProbes
    } yield {
      val bits = java.lang.Long.numberOfTrailingZeros(kc.toLong)
      s"""SELECT n_probe, pq_bits, k, n_queries, n_hits, n_reachable,
         |  CAST(n_hits AS DOUBLE) /
         |    CAST(${CurveK * DcgQueries} AS DOUBLE) AS recall,
         |  CAST(n_reachable AS DOUBLE) /
         |    CAST(${CurveK * DcgQueries} AS DOUBLE) AS reach_ceiling
         |FROM (SELECT
         |  CAST($np AS BIGINT) AS n_probe,
         |  CAST($bits AS BIGINT) AS pq_bits,
         |  CAST($CurveK AS BIGINT) AS k,
         |  CAST($DcgQueries AS BIGINT) AS n_queries,
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM (
         |    SELECT dd.q_id, dd.c_id,
         |      row_number() OVER (PARTITION BY dd.q_id
         |        ORDER BY dd.dist, dd.c_id) AS rank
         |    FROM (
         |      SELECT cand.q_id, cand.c_id, CAST(sum(t.dd) AS BIGINT) AS dist
         |      FROM (
         |        SELECT p.q_id, a.vec_id AS c_id
         |        FROM (SELECT vec_id AS q_id, cid AS cell FROM cdist
         |              WHERE rn <= $np AND vec_id < $DcgQueries) p
         |        JOIN (SELECT vec_id, cid AS cell FROM cdist WHERE rn = 1) a
         |          ON a.cell = p.cell
         |        WHERE a.vec_id <> p.q_id) cand
         |      JOIN chosen$kc qch ON qch.vec_id = cand.q_id
         |      JOIN chosen$kc cch ON cch.vec_id = cand.c_id
         |        AND cch.s_idx = qch.s_idx
         |      JOIN sdct$kc t ON t.s_idx = qch.s_idx AND t.ca = qch.c
         |        AND t.cb2 = cch.c
         |      GROUP BY 1, 2) dd) r
         |   JOIN qtrue ON qtrue.q_id = r.q_id AND qtrue.c_id = r.c_id
         |   WHERE r.rank <= $CurveK) AS n_hits,
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM qtrue t
         |   JOIN (SELECT vec_id AS q_id, cid AS cell FROM cdist
         |         WHERE rn <= $np AND vec_id < $DcgQueries) p
         |     ON p.q_id = t.q_id
         |   JOIN (SELECT vec_id, cid AS cell FROM cdist WHERE rn = 1) a
         |     ON a.vec_id = t.c_id AND a.cell = p.cell) AS n_reachable
         |) pt""".stripMargin
    }).map(p => s"($p)").mkString("\nUNION ALL\n")
    s"""WITH vq AS MATERIALIZED (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |c8 AS (SELECT vec_id AS cid, vq AS cq FROM vq WHERE vec_id < 8),
       |cdist AS MATERIALIZED (SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, 64),
       |        j -> (v.vq[j] - c.cq[j]) * (v.vq[j] - c.cq[j]))), c.cid) AS rn
       |  FROM vq v, c8 c),
       |qtrue AS MATERIALIZED (SELECT q_id, c_id FROM (
       |  SELECT q.vec_id AS q_id, v.vec_id AS c_id,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, 64),
       |        j -> (q.vq[j] - v.vq[j]) * (q.vq[j] - v.vq[j]))), v.vec_id)
       |      AS br
       |  FROM vq q, vq v
       |  WHERE q.vec_id < $DcgQueries AND v.vec_id <> q.vec_id) z
       |  WHERE br <= $CurveK),
       |$perCode
       |$points
       |ORDER BY pq_bits, n_probe""".stripMargin
  }

  /** The q75 oracle: the full recall computation in DuckDB, with lshTopK's
    * seeded-Gaussian hyperplanes inlined as literal doubles (shortest
    * round-trip decimal strings parse back to the identical IEEE double).
    */
  /** DuckDB rendering of the production SRP bucket: seeded-Gaussian planes
    * inlined verbatim (Scala Double.toString is shortest-roundtrip decimal,
    * so DuckDB parses back the IDENTICAL doubles), bit i set iff the
    * sequential dot ≥ 0 — the q75-pinned fragment, factored for reuse by
    * the q33/q34 direct oracles.
    */
  private def srpBucketSql(nBits: Int, vecExpr: String): String =
    Similarity.hyperplanes(64, nBits, 42L).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(range(1, 65), " +
          s"j -> $vecExpr[j]::DOUBLE * ($lst)[j])) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")

  /** q33's direct oracle: the production lshTopK query plan replayed in
    * SQL — inlined planes, Hamming ≤ RecallProbe probe predicate, exact
    * cosine, top-10.
    */
  private def lshTopKOracleSql: String = {
    val cosExpr =
      """round(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |    i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
        |  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |   sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 4)""".stripMargin
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cos AS (SELECT e.vec_id, $cosExpr AS cos_sim
       |  FROM embeddings e, q WHERE e.vec_id <> 0),
       |b AS (SELECT vec_id, ${srpBucketSql(RecallBits, "embedding")} AS bucket
       |  FROM embeddings),
       |qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0)
       |SELECT b.vec_id, cos.cos_sim FROM b, qb, cos
       |WHERE bit_count(xor(b.bucket, qb.qbucket)) <= $RecallProbe
       |  AND cos.vec_id = b.vec_id
       |ORDER BY cos.cos_sim DESC, b.vec_id LIMIT 10""".stripMargin
  }

  /** q53's oracle: the fixed-rule IVF (16 lowest-id quantized centroids,
    * 3 probed cells) + exact-cosine top-10 — the q72/q75 integer-math
    * machinery with the top-k readout.
    */
  private def ivfTopKFixedOracleSql: String = {
    val cosExpr =
      """round(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |    i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
        |  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |   sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 4)""".stripMargin
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cos AS (SELECT e.vec_id, $cosExpr AS cos_sim
       |  FROM embeddings e, q WHERE e.vec_id <> 0),
       |vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |c AS (SELECT vec_id AS cid, vq AS cq FROM vq WHERE vec_id < 16),
       |qcell AS (SELECT cid FROM (
       |  SELECT c.cid, list_sum(list_transform(generate_series(1, 64),
       |    j -> (q2.vq[j] - c.cq[j]) * (q2.vq[j] - c.cq[j]))) AS dist
       |  FROM vq q2, c WHERE q2.vec_id = 0 ORDER BY dist, cid LIMIT 3) y),
       |assign AS (SELECT vec_id, cell FROM (
       |  SELECT v.vec_id, c.cid AS cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, 64),
       |        j -> (v.vq[j] - c.cq[j]) * (v.vq[j] - c.cq[j]))), c.cid) AS rn
       |  FROM vq v, c) z WHERE rn = 1)
       |SELECT a.vec_id, cos.cos_sim FROM assign a
       |JOIN cos ON cos.vec_id = a.vec_id
       |WHERE a.cell IN (SELECT cid FROM qcell)
       |ORDER BY cos.cos_sim DESC, a.vec_id LIMIT 10""".stripMargin
  }

  /** q34's direct oracle: production SRP buckets (inlined planes), bucket
    * equi-candidates, rounded-cosine ≥ threshold verify.
    */
  private def nearDupPairsOracleSql: String =
    s"""WITH b AS (SELECT vec_id, embedding,
       |  ${srpBucketSql(4, "embedding")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       |    round(${cosSqlExpr("a.embedding", "b2.embedding")}, 4) AS cos_sim
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
       |SELECT id_a, id_b, cos_sim FROM p
       |WHERE cos_sim >= CAST(0.35 AS DOUBLE)
       |ORDER BY id_a, id_b""".stripMargin

  /** q258's oracle: the whole graph-ANN search unrolled — quantized
    * vectors, the exact degree-capped graph, `BeamHops` beam steps per
    * beam width (each: expand out-edges ∪ beam, distinct, rank by
    * (integer L2, id), keep ef), final top-k excluding the query, and
    * the recall join against brute force. Everything integer or one
    * exact division, so the hash pins index build AND search.
    */
  private def beamAnnOracleSql: String = {
    def dist(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 64), " +
        s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))"
    def beamChain(ef: Int): String = {
      val steps = (1 to BeamHops).map { h =>
        s"""bm${h}_$ef AS MATERIALIZED (
           |  SELECT q, v FROM (
           |    SELECT t.q, t.v, row_number() OVER (PARTITION BY t.q
           |      ORDER BY ${dist("s.x", "c.x")}, t.v) AS rn
           |    FROM (SELECT DISTINCT q, v FROM (
           |        SELECT q, v FROM bm${h - 1}_$ef
           |        UNION ALL
           |        SELECT b.q, g.d AS v
           |        FROM bm${h - 1}_$ef b JOIN graph g ON g.s = b.v)) t
           |    JOIN qv c ON c.v = t.v
           |    JOIN qs s ON s.q = t.q)
           |  WHERE rn <= $ef)""".stripMargin
      }.mkString(",\n")
      s"""bm0_$ef AS (SELECT q, CAST(0 AS BIGINT) AS v FROM qs),
         |$steps,
         |res_$ef AS (SELECT q, v FROM (
         |  SELECT t.q, t.v, row_number() OVER (PARTITION BY t.q
         |    ORDER BY ${dist("s.x", "c.x")}, t.v) AS rn
         |  FROM bm${BeamHops}_$ef t
         |  JOIN qv c ON c.v = t.v
         |  JOIN qs s ON s.q = t.q
         |  WHERE t.v <> t.q)
         |WHERE rn <= $BeamK)""".stripMargin
    }
    val rows = BeamEfs.map { ef =>
      s"""SELECT CAST($ef AS BIGINT) AS beam_width,
         |  CAST((SELECT count(*) FROM qs) AS BIGINT) AS n_queries,
         |  round(CAST((SELECT count(*) FROM res_$ef r
         |    JOIN brute b ON b.q = r.q AND b.v = r.v) AS DOUBLE)
         |    / CAST(${BeamNq * BeamK} AS DOUBLE), 4) AS recall_at_k"""
        .stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH qv AS MATERIALIZED (SELECT vec_id AS v,
       |    list_transform(embedding,
       |      x -> round(x::DOUBLE * 1000)::BIGINT) AS x
       |  FROM embeddings),
       |qs AS MATERIALIZED (SELECT v AS q, x FROM qv WHERE v < $BeamNq),
       |graph AS MATERIALIZED (SELECT s, d FROM (
       |  SELECT a.v AS s, b.v AS d, row_number() OVER (PARTITION BY a.v
       |    ORDER BY ${dist("a.x", "b.x")}, b.v) AS rn
       |  FROM qv a JOIN qv b ON a.v <> b.v)
       |WHERE rn <= $BeamDegree),
       |brute AS MATERIALIZED (SELECT q, v FROM (
       |  SELECT s.q, c.v, row_number() OVER (PARTITION BY s.q
       |    ORDER BY ${dist("s.x", "c.x")}, c.v) AS rn
       |  FROM qs s JOIN qv c ON c.v <> s.q)
       |WHERE rn <= $BeamK),
       |${BeamEfs.map(beamChain).mkString(",\n")}
       |SELECT * FROM ($rows) ORDER BY beam_width""".stripMargin
  }

  private def recallOracleSql: String = {
    val cosExpr =
      """round(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |    i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
        |  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |   sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 4)""".stripMargin
    val bits = Similarity.hyperplanes(64, RecallBits, 42L).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(range(1, 65), " +
          s"j -> embedding[j]::DOUBLE * ($lst)[j])) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cos AS (SELECT e.vec_id, $cosExpr AS cos_sim
       |  FROM embeddings e, q WHERE e.vec_id <> 0),
       |brute AS (SELECT vec_id FROM cos ORDER BY cos_sim DESC, vec_id LIMIT 10),
       |b AS (SELECT vec_id, $bits AS bucket FROM embeddings),
       |qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0),
       |lshtop AS (SELECT x.vec_id FROM (
       |  SELECT b.vec_id, cos.cos_sim FROM b, qb, cos
       |  WHERE bit_count(xor(b.bucket, qb.qbucket)) <= $RecallProbe
       |    AND cos.vec_id = b.vec_id
       |  ORDER BY cos.cos_sim DESC, b.vec_id LIMIT 10) x),
       |vq AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |c AS (SELECT vec_id AS cid, vq AS cq FROM vq WHERE vec_id < 8),
       |qcell AS (SELECT cid FROM (
       |  SELECT c.cid, list_sum(list_transform(generate_series(1, 64),
       |    j -> (q.vq[j] - c.cq[j]) * (q.vq[j] - c.cq[j]))) AS dist
       |  FROM vq q, c WHERE q.vec_id = 0 ORDER BY dist, cid LIMIT 3) y),
       |assign AS (SELECT vec_id, cell FROM (
       |  SELECT v.vec_id, c.cid AS cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, 64),
       |        j -> (v.vq[j] - c.cq[j]) * (v.vq[j] - c.cq[j]))), c.cid) AS rn
       |  FROM vq v, c) z WHERE rn = 1),
       |ivftop AS (SELECT x.vec_id FROM (
       |  SELECT a.vec_id, cos.cos_sim FROM assign a
       |  JOIN cos ON cos.vec_id = a.vec_id
       |  WHERE a.cell IN (SELECT cid FROM qcell)
       |  ORDER BY cos.cos_sim DESC, a.vec_id LIMIT 10) x)
       |SELECT
       |  (SELECT count(*) / 10.0 FROM lshtop JOIN brute USING (vec_id)) AS recall_lsh,
       |  (SELECT count(*) / 10.0 FROM ivftop JOIN brute USING (vec_id)) AS recall_ivf""".stripMargin
  }

  /** The q181 oracle: KmIters unrolled Lloyd passes. Every CTE mirrors
    * the Spark step 1:1 — argmin = row_number over (dist, cell); update =
    * integer sums snapped with the shift-positive floor division (`//`
    * truncates in DuckDB, but the shifted numerator is positive, where
    * truncation == floor == the JVM driver formula). Empty cells keep the
    * previous centroid via the LEFT JOIN coalesce.
    */
  private def kmeansOracleSql: String = {
    val dist =
      "list_sum(list_transform(generate_series(1, 64), " +
        "j -> (q.vq[j] - c.cv[j]) * (q.vq[j] - c.cv[j])))"
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (SELECT vec_id,
              |  list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
              |  FROM embeddings),
              |c0 AS (SELECT vec_id AS cell, vq AS cv FROM q WHERE vec_id < $KmK),""".stripMargin
    for (i <- 1 to KmIters) {
      sb ++= s"""
                |d$i AS (SELECT q.vec_id, q.vq, c.cell, $dist AS dd
                |  FROM q CROSS JOIN c${i - 1} c),
                |a$i AS (SELECT vec_id, vq, cell, dd FROM (SELECT *,
                |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn
                |  FROM d$i) WHERE rn = 1),""".stripMargin
      if (i < KmIters)
        sb ++= s"""
                  |u$i AS (SELECT cell, j, (((2*sum(vq[j]) + count(*) + 2*count(*)*$KmB)
                  |    // (2*count(*))) - $KmB)::BIGINT AS cd
                  |  FROM a$i, generate_series(1, 64) AS g(j) GROUP BY cell, j),
                  |n$i AS (SELECT cell, list(cd ORDER BY j) AS cv FROM u$i GROUP BY cell),
                  |c$i AS (SELECT p.cell, coalesce(n.cv, p.cv) AS cv
                  |  FROM c${i - 1} p LEFT JOIN n$i n USING (cell)),""".stripMargin
    }
    sb ++= s"""
              |census AS (SELECT cell, count(*) AS n_points, sum(dd)::BIGINT AS wcss
              |  FROM a$KmIters GROUP BY cell),
              |cs AS (SELECT cell, list_sum(cv)::BIGINT AS c_sum,
              |    list_sum(list_transform(cv, x -> abs(x)))::BIGINT AS c_abs
              |  FROM c${KmIters - 1})
              |SELECT census.cell::BIGINT AS cell, n_points, wcss, c_sum, c_abs
              |FROM census JOIN cs USING (cell) ORDER BY cell""".stripMargin
    sb.toString
  }

  /** Exact-double cosine between two FLOAT[] columns — the q31 fold shape
    * (sequential list_sum == Spark's aggregate HOF == the driver loop).
    */
  private def cosSqlExpr(a: String, b: String): String =
    s"(list_sum(list_transform(generate_series(1, 64), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) / " +
      s"(sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) * " +
      s"sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE)))))"

  /** The q182 oracle: MmrK unrolled greedy steps. Scores stay unrounded
    * (negative-value rounding is the one engine-divergent op); λ/μ are
    * CAST(… AS DOUBLE) so no DECIMAL arithmetic sneaks in (the q90-wave
    * decimal-literal trap).
    */
  private def mmrOracleSql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              |rel AS (SELECT e.vec_id, e.embedding, ${cosSqlExpr("e.embedding", "qv.qe")} AS rel
              |  FROM embeddings e, qv WHERE e.vec_id <> 0),
              |pool AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT $MmrPool),
              |sim AS (SELECT a.vec_id AS ia, b.vec_id AS ib, ${cosSqlExpr("a.embedding", "b.embedding")} AS s
              |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
              |p1 AS (SELECT p.vec_id, CAST(0.7 AS DOUBLE) * p.rel AS sc, p.rel
              |  FROM pool p ORDER BY sc DESC, vec_id LIMIT 1),
              |sel1 AS (SELECT CAST(1 AS BIGINT) AS step, vec_id, sc, rel FROM p1),""".stripMargin
    for (i <- 2 to MmrK)
      sb ++= s"""
                |p$i AS (SELECT p.vec_id,
                |    CAST(0.7 AS DOUBLE) * p.rel - CAST(0.3 AS DOUBLE) *
                |      (SELECT max(s.s) FROM sim s WHERE s.ia = p.vec_id
                |        AND s.ib IN (SELECT vec_id FROM sel${i - 1})) AS sc,
                |    p.rel
                |  FROM pool p WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
                |  ORDER BY sc DESC, vec_id LIMIT 1),
                |sel$i AS (SELECT * FROM sel${i - 1}
                |  UNION ALL SELECT CAST($i AS BIGINT), vec_id, sc, rel FROM p$i),""".stripMargin
    sb.toString.stripSuffix(",") +
      s"\nSELECT step, vec_id, sc AS mmr_score, rel FROM sel$MmrK ORDER BY step"
  }

  /** The q183 oracle: quantized SRP buckets (q70's plane rendering), the
    * eval side exploded over its Hamming≤1 probe masks, rounded-cosine
    * verify, then the census with the Spark-identical best-hit rule
    * (max cos, ties to lowest eval id).
    */
  private def deconOracleSql: String = {
    val bits = Similarity.quantPlanes(64, SemBits).zipWithIndex.map {
      case (p, i) =>
        val lst = p.mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
          s"j -> ($lst)[j] * vq[j])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n  ")
    val masks = (0L +: (0 until SemBits).map(i => 1L << i))
      .map(m => s"($m)").mkString("(VALUES ", ", ", ") m(mask)")
    s"""WITH q AS (SELECT vec_id, embedding,
       |    list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS vq
       |  FROM embeddings),
       |b AS (SELECT vec_id, embedding, CAST($bits AS BIGINT) AS bucket FROM q),
       |ev AS (SELECT vec_id AS eval_id, embedding AS e_vec, bucket
       |  FROM b WHERE vec_id % $DeconMod = 0),
       |co AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id % $DeconMod <> 0),
       |probe AS (SELECT eval_id, e_vec, xor(bucket, m.mask) AS bucket FROM ev, $masks),
       |hits AS (SELECT * FROM (
       |    SELECT co.vec_id, probe.eval_id,
       |      round(${cosSqlExpr("co.embedding", "probe.e_vec")}, 4) AS cs
       |    FROM co JOIN probe USING (bucket))
       |  WHERE cs >= CAST($SemThreshold AS DOUBLE)),
       |agg AS (SELECT vec_id, count(*) AS n_eval_hits, max(cs) AS best_sim
       |  FROM hits GROUP BY vec_id),
       |best AS (SELECT h.vec_id, min(h.eval_id) AS best_eval_id
       |  FROM hits h JOIN agg a ON h.vec_id = a.vec_id AND h.cs = a.best_sim
       |  GROUP BY h.vec_id)
       |SELECT a.vec_id, a.n_eval_hits, a.best_sim, b2.best_eval_id
       |FROM agg a JOIN best b2 USING (vec_id) ORDER BY vec_id""".stripMargin
  }
}
