package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native Catalyst functions.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    or `SparkSession.builder().withExtensions(...)` (used by GraftSession);
  *  - `GraftFunctions.register(spark)` for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // runs in the operator-optimization batch, BEFORE Spark's
    // RewriteDistinctAggregates lowers multi-distinct plans to Expand
    ext.injectOptimizerRule(_ => graft.plans.SplitDistinctAggregates)
  }
}

object GraftFunctions {

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes 2 arguments")
        CosineSimilarity(args.head, args(1))
      }
    ),
    (
      "jaccard_similarity",
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaccard_similarity takes 2 arguments")
        JaccardSimilarity(args.head, args(1))
      }
    ),
    (
      "minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_signature takes 3 arguments")
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature $what must be an integer literal, got $other")
        }
        MinHashSignature(args.head,
          litInt(args(1), "nHashes"), litInt(args(2), "constBits"))
      }
    ),
    (
      "top_token_count",
      new ExpressionInfo(classOf[TopTokenCount].getName, "top_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "top_token_count takes 1 argument")
        TopTokenCount(args.head)
      }
    ),
    (
      "text_piece_counts",
      new ExpressionInfo(classOf[TextPieceCounts].getName, "text_piece_counts"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "text_piece_counts takes 1 argument")
        TextPieceCounts(args.head)
      }
    ),
    (
      "token_stats",
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "token_stats takes 1 argument")
        TokenStats(args.head)
      }
    ),
    (
      "word_gram_hashes",
      new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_gram_hashes takes (tokens, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_gram_hashes n must be an integer literal, got $other")
        }
        WordGramHashes(args.head, n)
      }
    ),
    (
      "srp_bucket",
      new ExpressionInfo(classOf[SrpBucket].getName, "srp_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "srp_bucket takes (vec, planes)")
        SrpBucket(args.head, VectorOps.foldableMatrix(args(1)))
      }
    ),
    (
      "srp_bucket_q",
      new ExpressionInfo(classOf[SrpBucketQ].getName, "srp_bucket_q"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "srp_bucket_q takes (quantized_vec, planes)")
        SrpBucketQ(args.head, VectorOps.foldableLongMatrix(args(1)))
      }
    ),
    (
      "ivf_argmin",
      new ExpressionInfo(classOf[IvfArgMin].getName, "ivf_argmin"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ivf_argmin takes (quantized_vec, centroids)")
        IvfArgMin(args.head, VectorOps.foldableLongMatrix(args(1)))
      }
    ),
    (
      "ivf_topcells",
      new ExpressionInfo(classOf[IvfTopCells].getName, "ivf_topcells"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "ivf_topcells takes (quantized_vec, centroids, nProbe)")
        val nProbe = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ivf_topcells nProbe must be an integer literal, got $other")
        }
        IvfTopCells(args.head, VectorOps.foldableLongMatrix(args(1)), nProbe)
      }
    ),
    (
      "mode_det",
      new ExpressionInfo(classOf[DeterministicMode].getName, "mode_det"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "mode_det takes 1 argument")
        DeterministicMode(args.head).toAggregateExpression()
      }
    ),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its own
    // runtime row-level filtering but does not expose them in the SQL
    // registry; graft surfaces them for the blocklist-filter fast path
    // (Curation.blocklistFilter). Args: (xxhash64 long, est. items, bits).
    (
      "bloom_filter_agg",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (args: Seq[Expression]) => {
        require(args.length >= 1 && args.length <= 3,
          "bloom_filter_agg takes (value[, estimatedItems[, numBits]])")
        val agg = args.length match {
          case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(args.head)
          case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(args.head, args(1))
          case _ => new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(args.head, args(1), args(2))
        }
        agg.toAggregateExpression()
      }
    ),
    (
      "top_k_longs",
      new ExpressionInfo(classOf[TopKLongs].getName, "top_k_longs"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_k_longs takes (col, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_k_longs k must be an integer literal, got $other")
        }
        TopKLongs(args.head, k).toAggregateExpression()
      }
    ),
    (
      "arg_max_tied_low",
      new ExpressionInfo(classOf[ArgMaxTiedLow].getName, "arg_max_tied_low"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "arg_max_tied_low takes (ord, id)")
        ArgMaxTiedLow(args.head, args(1)).toAggregateExpression()
      }
    ),
    (
      "bootstrap_poisson_agg",
      new ExpressionInfo(classOf[BootstrapPoissonAgg].getName, "bootstrap_poisson_agg"),
      (args: Seq[Expression]) => {
        require(args.length >= 3,
          "bootstrap_poisson_agg takes (nSim, hash, value...)")
        val nSim = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bootstrap_poisson_agg nSim must be an integer literal, got $other")
        }
        BootstrapPoissonAgg(args(1), args.drop(2), nSim).toAggregateExpression()
      }
    ),
    (
      "bootstrap_seeded_agg",
      new ExpressionInfo(classOf[BootstrapSeededAgg].getName, "bootstrap_seeded_agg"),
      (args: Seq[Expression]) => {
        require(args.length >= 3,
          "bootstrap_seeded_agg takes (nSim, seed, value...)")
        val nSim = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bootstrap_seeded_agg nSim must be an integer literal, got $other")
        }
        val seed = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"bootstrap_seeded_agg seed must be an integer literal, got $other")
        }
        BootstrapSeededAgg(args.drop(2), nSim, seed).toAggregateExpression()
      }
    ),
    (
      "bloom_might_contain",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_might_contain takes (bloom, value)")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args.head, args(1))
      }
    ),
    (
      "hilbert_index",
      new ExpressionInfo(classOf[HilbertIndex2].getName, "hilbert_index"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hilbert_index takes (x, y)")
        HilbertIndex2(args.head, args(1))
      }
    ),
    (
      "wordpiece_stats",
      new ExpressionInfo(classOf[WordpieceStats].getName, "wordpiece_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "wordpiece_stats takes (word, whole_pieces, cont_pieces)")
        // the literal piece arrays are consumed into the payload here —
        // the expression tree (and every plan string) keeps a shape tag
        WordpieceStats(args.head, WordpieceStats.vocab(
          WordpieceStats.foldableStrings(args(1)),
          WordpieceStats.foldableStrings(args(2))))
      }
    ),
    (
      "multi_pattern_counts",
      new ExpressionInfo(classOf[MultiPatternCounts].getName,
        "multi_pattern_counts"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "multi_pattern_counts takes (text, patterns)")
        MultiPatternCounts(args.head, MultiPatternCounts.build(
          WordpieceStats.foldableStrings(args(1))))
      }
    ),
    (
      "nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes (str)")
        NfcNormalize(args.head)
      }
    ),
    (
      "strip_accents",
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "strip_accents takes (str)")
        StripAccents(args.head)
      }
    ),
    (
      "portable_hash60",
      new ExpressionInfo(classOf[PortableHash60].getName, "portable_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "portable_hash60 takes 1 argument")
        PortableHash60(args.head)
      }
    ),
    (
      "deletion_sig_hashes",
      new ExpressionInfo(classOf[DeletionSigHashes].getName,
        "deletion_sig_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deletion_sig_hashes takes 1 argument")
        DeletionSigHashes(args.head)
      }
    ),
    (
      "qdist_l2",
      new ExpressionInfo(classOf[QDistL2].getName, "qdist_l2"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "qdist_l2 takes 2 arguments")
        QDistL2(args.head, args(1))
      }
    ),
    (
      "gpt2_byte_sym",
      new ExpressionInfo(classOf[Gpt2ByteSym].getName, "gpt2_byte_sym"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "gpt2_byte_sym takes (str)")
        Gpt2ByteSym(args.head)
      }
    )
  )

  /** Column-API form of the deterministic-tie mode aggregate. */
  def modeDet(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("mode_det", c)

  /** Column-API form of the bounded smallest-k aggregate over longs. */
  def topKLongs(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("top_k_longs", c,
      org.apache.spark.sql.functions.lit(k))

  /** Column-API form of the primitive-buffer argmax (ties to lowest id). */
  def argMaxTiedLow(ord: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("arg_max_tied_low", ord, id)

  /** Column-API form of the fused portable-Poisson bootstrap aggregate. */
  def bootstrapPoissonAgg(nSim: Int, hash: org.apache.spark.sql.Column,
      values: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("bootstrap_poisson_agg",
      (org.apache.spark.sql.functions.lit(nSim) +: hash +: values): _*)

  /** Column-API form of the fused SEEDED-RNG Poisson bootstrap aggregate. */
  def bootstrapSeededAgg(nSim: Int, seed: Long,
      values: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("bootstrap_seeded_agg",
      (org.apache.spark.sql.functions.lit(nSim) +:
        org.apache.spark.sql.functions.lit(seed) +: values): _*)

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
