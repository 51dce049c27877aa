package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    // 0 and 10 nearly identical; 1 orthogonal-ish; rest random-ish (seeded)
    val rng = new scala.util.Random(7)
    val base = Array.fill(8)(rng.nextGaussian().toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val rows = Seq(0L -> base, 10L -> near, 1L -> Array.fill(8)(0f).updated(1, 1f)) ++
      (2L to 9L).map(i => i -> Array.fill(8)(rng.nextGaussian().toFloat))
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: hand-checked values") {
    import spark.implicits._
    val d = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(1f, 1f), Seq(1f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(d(0)) < 1e-12)
    assert(math.abs(d(1) - 1.0) < 1e-12)
    assert(math.abs(d(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK: planted near-duplicate ranks first") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .collect()
    assert(top.head.getLong(0) == 10L)
    assert(top.head.getAs[Double]("cos_sim") > 0.999)
  }

  test("lshTopK: same bucket recovers the planted near-duplicate") {
    val top = Similarity.lshTopK(vecs, "vec_id", "embedding", 0L, 3,
      dim = 8, nBits = 2)
    assert(top.collect().map(_.getLong(0)).contains(10L))
  }

  test("ivfTopK: coarse quantizer probe finds the planted near-duplicate") {
    val idx = Similarity.ivfIndex(vecs, "embedding", kClusters = 3)
    val top = Similarity.ivfTopK(idx, "vec_id", "embedding", 0L, 3, nProbe = 2)
    assert(top.collect().map(_.getLong(0)).contains(10L))
  }

  test("ivfTopKFixed (q53's oracled form): fixed-rule quantizer probe also " +
    "finds the planted near-duplicate; self excluded; ranked by cosine") {
    val top = Similarity.ivfTopKFixed(vecs, "vec_id", "embedding", 0L, 3,
      kCells = 3, nProbe = 2).collect()
    assert(top.map(_.getLong(0)).contains(10L))
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse, s"not cosine-ranked: $sims")
  }

  test("lshBucket: matrix-literal form is bit-identical to per-plane literals") {
    // the round-1 formulation, kept here as the compat reference: one
    // array(lit…) + dot per bit
    def literalReference(vec: org.apache.spark.sql.Column, dim: Int,
        nBits: Int, seed: Long): org.apache.spark.sql.Column = {
      val rng = new scala.util.Random(seed)
      val planes = Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
      planes.zipWithIndex.map { case (p, i) =>
        val d = Similarity.dot(vec, array(p.toIndexedSeq.map(lit(_)): _*))
        when(d >= 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (0L until 64L).map(i => i -> Array.fill(64)(rng.nextGaussian().toFloat))
      .toDF("id", "v")
    val both = df.select(
      Similarity.lshBucket(col("v"), 64, nBits = 16, seed = 42L).as("nu"),
      literalReference(col("v"), 64, nBits = 16, seed = 42L).as("old"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(both.map(_.getLong(0)).distinct.length > 1) // not all one bucket
  }

  test("lshBucket: dim=1024 doesn't bloat the expression tree") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = (0L until 8L).map(i => i -> Array.fill(1024)(rng.nextGaussian().toFloat))
      .toDF("id", "v")
    val out = df.select(col("id"),
      Similarity.lshBucket(col("v"), 1024, nBits = 32).as("b"))
    // literal payloads don't count toward expression-tree size: the single
    // projection expression stays tiny even at 32×1024 plane weights
    val exprNodes = out.queryExecution.analyzed.expressions
      .map(_.collect { case _ => 1 }.sum).sum
    assert(exprNodes < 2000, s"expression tree has $exprNodes nodes")
    assert(out.collect().length == 8) // and it executes
  }

  test("native srp_bucket is bit-identical to the composable HOF form " +
    "(incl. null vector)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val df = ((0L until 200L).map(i =>
        i -> Array.fill(64)(rng.nextGaussian().toFloat)) :+
        (999L -> null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val both = df.select(
      Similarity.lshBucket(col("v"), 64, nBits = 16).as("nat"),
      Similarity.lshBucketComposable(col("v"), 64, nBits = 16).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
    assert(both.count(_.isNullAt(0)) == 1) // null vector → null bucket
  }

  test("native ivf_argmin is bit-identical to the composable HOF form " +
    "(incl. null vector + ties to lowest index)") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val centroids = (0 until 6).map(c =>
      (0 until 16).map(j => ((c * 37 + j * 11) % 500).toLong))
    val df = ((0L until 200L).map(i =>
        i -> Array.fill(16)(rng.nextGaussian().toFloat)) ++
        // exact copies of centroid 2 twice over → distance ties among rows,
        // and a vector equidistant-by-construction is covered by random draws
        Seq(500L -> centroids(2).map(_.toFloat / 1000f).toArray,
          999L -> null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val both = df.select(col("id"),
      Similarity.ivfAssignQuantized(col("v"), centroids).as("nat"),
      Similarity.ivfAssignQuantizedComposable(col("v"), centroids).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), r.toString)
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2), r.toString)
    }
    val self = both.find(_.getLong(0) == 500L).get
    assert(self.getLong(1) == 2L, s"centroid copy must self-assign: $self")
  }

  test("knnJoin: per-query ranked neighbors; planted dup ranks first") {
    val out = Similarity.knnJoin(vecs, vecs, "vec_id", "embedding",
        k = 2, dim = 8, nBits = 2, probeHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val q0 = out.filter(_._1 == 0L)
    assert(q0.nonEmpty && q0.head == ((0L, 10L, 1L)),
      s"query 0's rank-1 neighbor must be the planted dup: ${q0.toSeq}")
    // ranks are 1..k and dense per query
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length),
        s"query $q ranks: ${rows.toSeq}")
    }
  }

  test("PQ: codeword-source rows self-encode; own reconstruction has ADC 0; " +
    "pqTrain yields well-shaped codebooks") {
    val cbs = Similarity.pqCodebooksFixed(vecs, "vec_id", "embedding",
      dim = 8, m = 2, kCodes = 4)
    assert(cbs.length == 2 && cbs.forall(_.length == 4) &&
      cbs.forall(_.forall(_.length == 4)))
    val encoded = vecs.select(col("vec_id"),
      Similarity.pqEncode(col("embedding"), cbs).as("codes"))
    val codesOf = encoded.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // each codebook-source row's subvectors ARE codewords → distance 0 →
    // self-assignment in every subspace
    (0L until 4L).foreach(j =>
      assert(codesOf(j) == Seq(j, j), s"row $j codes: ${codesOf(j)}"))
    // ADC of a source row against its own query tables is exactly 0
    val qq = vecs.filter(col("vec_id") === 0)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")))
      .head().getSeq[Long](0).toIndexedSeq
    val tables = Similarity.pqAdcTables(qq, cbs)
    val adc0 = encoded.filter(col("vec_id") === 0)
      .select(Similarity.pqAdcScore(col("codes"), tables))
      .head().getLong(0)
    assert(adc0 == 0L, s"self ADC must be 0, got $adc0")
    // production trainer: shape + self-consistent encode domain
    val trained = Similarity.pqTrain(vecs, "embedding", dim = 8, m = 2,
      kCodes = 3)
    assert(trained.length == 2 && trained.forall(_.length == 3))
    val codes = vecs.select(
      Similarity.pqEncode(col("embedding"), trained).as("c"))
      .collect().flatMap(_.getSeq[Long](0))
    assert(codes.forall(c => c >= 0 && c < 3))
  }

  test("semanticDedup: planted near-dup collapses to the LOWEST id") {
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        dim = 8, threshold = 0.99, nBits = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!out.contains(10L), "the higher-id duplicate must be removed")
    assert(out.contains(0L), "the lowest id of the cluster survives")
    assert(out.size == vecs.count() - 1, "exactly one row removed")
  }

  test("nearDupPairs: finds only the planted pair at high threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      dim = 8, threshold = 0.99, nBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 10L)))
  }

  test("hardNegatives picks the nearest CROSS-label vector, skipping a " +
    "closer same-label one; zero vectors excluded") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(1f, 0f, 0f), 0),     // anchor
      (2L, Array(0.99f, 0.1f, 0f), 0), // closest overall but SAME label
      (3L, Array(0.9f, 0.3f, 0f), 1),  // closest cross-label → the answer
      (4L, Array(0f, 1f, 0f), 1),
      (5L, Array(0f, 0f, 0f), 2)       // zero norm: excluded entirely
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(d, "vec_id", "embedding", "label")
      .select("vec_id", "hard_neg_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 3L)
    assert(!out.contains(5L), "zero vector must not be an anchor")
    assert(!out.values.toSet.contains(5L), "zero vector must not be a negative")
  }

  test("silhouetteQuantized: hand-computed scores; equidistant vector ties " +
    "to the lower centroid with silhouette 0") {
    import spark.implicits._
    val cents = Seq(Seq(0L, 0L), Seq(10000L, 0L)) // quantized (0,0), (10,0)
    val d = Seq(
      (1L, Array(1f, 0f)),  // cell 0: s = (81e6−1e6)/81e6 = 80/81
      (2L, Array(10f, 0f)), // cell 1: a = 0 → s = 1.0
      (3L, Array(5f, 0f))   // tie → cell 0, a = b → s = 0.0
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouetteQuantized(d, "vec_id", "embedding", cents)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 0.493827, 0.0, 0.987654),
      (1L, 1L, 1.0, 1.0, 1.0)))
  }

  test("mmrSelect: penalizes redundancy, keeps relevance order otherwise") {
    import spark.implicits._
    // a and b are near-duplicates aligned with the query; c is diverse.
    // pure relevance would pick (a, b); MMR must pick (a, c).
    val d = Seq(
      (0L, Array(1f, 0f, 0f)), // query
      (1L, Array(0.9f, 0.10f, 0f)), // a: most relevant
      (2L, Array(0.9f, 0.11f, 0f)), // b: near-dup of a
      (3L, Array(0.5f, 0f, 0.5f)) // c: diverse
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(d, "vec_id", "embedding", 0L,
      poolSize = 3, k = 2, lam = 0.5, mu = 0.5)
      .select("step", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 3L)))
    // k beyond pool size: returns the whole pool, no crash
    val all = Similarity.mmrSelect(d, "vec_id", "embedding", 0L,
      poolSize = 3, k = 10)
    assert(all.count() == 3)
  }

  test("semanticDecontaminate: flags near-eval rows with best-hit rule") {
    import spark.implicits._
    val ev = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (200L, Array(0.99f, 0.01f, 0f, 0f)) // near-identical second eval
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.98f, 0.02f, 0f, 0f)), // contaminated (hits both)
      (2L, Array(0f, 0f, 1f, 0f)) // clean
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, ev, "vec_id",
      "embedding", dim = 4, threshold = 0.9, nBits = 4, probeHamming = 1,
      portable = true).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // best hit = highest cosine; on a tie the LOWEST eval id wins
    assert(r.getLong(3) == 200L && r.getDouble(2) > 0.99)
  }

  test("rqEncodeCensus: residual stage strictly reduces reconstruction error") {
    val e = graft.queries.Q.t(spark, sfDir("0.01"), "embeddings")
    val census = Similarity.rqEncodeCensus(e, "vec_id", "embedding", dim = 64)
      .collect()
    assert(census.map(_.getLong(2)).sum == e.count())
    val rqErr = census.map(_.getLong(3)).sum
    // driver recompute of the stage-1-only error (distance to the coarse
    // centroid = the error RQ starts from)
    val vqs = e.orderBy("vec_id")
      .select(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.col("embedding"),
        x => org.apache.spark.sql.functions.round(x.cast("double") * 1000)
          .cast("long")))
      .collect().map(_.getSeq[Long](0).toIndexedSeq)
    val c1 = vqs.take(8)
    val stage1Err = vqs.map(v =>
      c1.map(c => c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum).min).sum
    assert(rqErr < stage1Err,
      s"RQ err $rqErr not below stage-1 err $stage1Err")
  }

  test("kmeansCodebookQuantized: snapping, convergence, empty-cell rule") {
    import spark.implicits._
    // two tight groups around (10,0) and (0,10) in quantized units —
    // means snap onto the grid and WCSS must not grow with more passes
    val d = Seq(
      (0L, Array(0.010f, 0.000f)), (1L, Array(0.000f, 0.010f)),
      (2L, Array(0.012f, 0.001f)), (3L, Array(0.001f, 0.012f)),
      (4L, Array(0.011f, -0.001f)), (5L, Array(-0.001f, 0.011f))
    ).toDF("vec_id", "embedding")
    val (a1, c1) = Similarity.kmeansCodebookQuantized(
      d, "vec_id", "embedding", dim = 2, k = 2, iters = 1)
    val (a3, c3) = Similarity.kmeansCodebookQuantized(
      d, "vec_id", "embedding", dim = 2, k = 2, iters = 3)
    def wcss(a: org.apache.spark.sql.DataFrame,
        c: IndexedSeq[IndexedSeq[Long]]): Long =
      a.select(col("_vq"), col("_cell")).collect().map { r =>
        val v = r.getSeq[Long](0); val cell = r.getAs[Number](1).intValue
        v.zip(c(cell)).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
    assert(wcss(a3, c3) <= wcss(a1, c1))
    // after convergence the two centroids are the snapped group means
    assert(c3.toSet == Set(IndexedSeq(11L, 0L), IndexedSeq(0L, 11L)))
    // clusters 0/1 split the two groups 3/3
    val sizes = a3.groupBy("_cell").count().collect()
      .map(_.getLong(1)).sorted.toSeq
    assert(sizes == Seq(3L, 3L))
    // empty-cell rule: k=3 over two distinct points → one cell never wins
    // an assignment and must keep its initial centroid, not crash
    val dd = Seq(
      (0L, Array(0.010f, 0f)), (1L, Array(0.010f, 0f)),
      (2L, Array(0.010f, 0f)), (3L, Array(-0.010f, 0f))
    ).toDF("vec_id", "embedding")
    val (_, ce) = Similarity.kmeansCodebookQuantized(
      dd, "vec_id", "embedding", dim = 2, k = 3, iters = 3)
    assert(ce.length == 3 && ce.contains(IndexedSeq(10L, 0L)))
  }

  test("centroidDrift: hand-computed cosines, null groups, one-sided groups") {
    import spark.implicits._
    // group 1: v1 sums to (2000, 0), v2 sums to (0, 3000) → cos 0
    // group 2: v1 (1000, 1000), v2 (2000, 2000) → cos 1
    // group 3: only in v1 → dropped (inner-join contract)
    // null group rows dropped
    val v1 = Seq(
      (Some(1), Array(1f, 0f)), (Some(1), Array(1f, 0f)),
      (Some(2), Array(1f, 1f)),
      (Some(3), Array(1f, 0f)),
      (None, Array(9f, 9f))
    ).toDF("label", "embedding")
    val v2 = Seq(
      (Some(1), Array(0f, 1f)), (Some(1), Array(0f, 1f)), (Some(1), Array(0f, 1f)),
      (Some(2), Array(2f, 2f))
    ).toDF("label", "embedding")
    val out = Similarity.centroidDrift(v1, v2, "label", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length === 2)
    assert(out(0)._1 === 1L && out(0)._2 === 2L && out(0)._3 === 3L)
    assert(math.abs(out(0)._4) < 1e-12, "orthogonal centroids → cos 0")
    assert(out(1)._1 === 2L && math.abs(out(1)._4 - 1.0) < 1e-12,
      "parallel centroids → cos 1 (scale-invariance)")
  }

  test("centroidDrift: zero-vector group reads 0, not NaN") {
    import spark.implicits._
    val v1 = Seq((1, Array(0f, 0f))).toDF("label", "embedding")
    val v2 = Seq((1, Array(1f, 1f))).toDF("label", "embedding")
    val out = Similarity.centroidDrift(v1, v2, "label", "embedding").collect()
    assert(out.length === 1 && out(0).getDouble(3) === 0.0)
  }

  test("labelNoiseByNeighbors flags exactly the planted mislabeled point") {
    import spark.implicits._
    // two tight clusters on orthogonal axes; point 5 sits IN cluster A but
    // carries cluster B's label → all 5 of its neighbors disagree
    def axis(i: Int, jitter: Float) =
      Array.fill(8)(0f).updated(i, 1f).updated(7, jitter)
    val rows =
      (0L to 4L).map(id => (id, axis(0, id * 0.001f), "a")) ++
        Seq((5L, axis(0, 0.005f), "b")) ++
        (6L to 11L).map(id => (id, axis(1, id * 0.001f), "b"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val census = Similarity.labelNoiseByNeighbors(
      df, "vec_id", "embedding", "label", k = 5, dim = 8, nBits = 3,
      portable = true)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(census("a")._3 == 0L)
    assert(census("b")._3 == 1L)
    // and the suspect is point 5 specifically: every neighbor disagrees
    val knn = Similarity.knnJoin(df, df, "vec_id", "embedding", k = 5,
      dim = 8, nBits = 3, portable = true)
    val nbrs5 = knn.filter(col("q_id") === 5L).select("c_id")
      .as[Long].collect().toSet
    assert(nbrs5.subsetOf(Set(0L, 1L, 2L, 3L, 4L)) && nbrs5.size == 5)
  }
}
