package graft.ext

import graft.SparkSpec
import graft.queries.Q
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bottomK: selects the k smallest hashes per shard, any salt count") {
    val rows = (for (s <- Seq("a", "b"); h <- 1L to 500L)
      yield (s, h * 7919L % 1000L)).distinct
    val df = rows.toDF("shard", "h").distinct()
    val got = Sketches.bottomK(df, "shard", "h", k = 10, salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (s, hs) =>
      hs.map(_._2).distinct.sorted.take(10).map(s -> _)
    }.toSet
    assert(got == want)
  }

  test("kmvCensus: merged row equals a direct global sketch (mergeability)") {
    val orders = Q.t(spark, sfDir("0.01"), "orders")
    val census = Sketches.kmvCensus(orders, "o_orderpriority", "o_custkey")
      .collect()
    assert(census.length == 6) // 5 priorities + ~all
    val all = census.find(_.getString(0) == "~all").get
    // direct global sketch: bottom-64 of all distinct hashes, computed
    // without the per-shard merge path
    val direct = Sketches.kmvCensus(
      orders.withColumn("one", lit("g")), "one", "o_custkey")
      .filter(col("shard") === "g").head()
    assert(all.getDouble(2) == direct.getDouble(2),
      s"merged ${all.getDouble(2)} vs direct ${direct.getDouble(2)}")
    // estimates land within a loose 4-sigma band of exact (k=64 → ~12.5%)
    census.foreach { r =>
      assert(r.getDouble(3) < 50.0, s"${r.getString(0)} err ${r.getDouble(3)}")
    }
  }

  test("kmvCensus: under-full sketch reports the exact count") {
    val tiny = Seq(("s", 1L), ("s", 2L), ("s", 3L)).toDF("g", "k")
    val c = Sketches.kmvCensus(tiny, "g", "k", k = 64)
      .filter(col("shard") === "s").head()
    assert(c.getLong(1) == 3L && c.getDouble(2) == 3.0 && c.getDouble(3) == 0.0)
  }

  test("bloomPositions: kH in-range positions, deterministic") {
    val df = Seq("alpha", "beta").toDF("t")
      .select(Sketches.bloomPositions(col("t"), m = 1 << 10, kH = 5).as("p"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows.forall(p => p.length == 5 && p.forall(x => x >= 0 && x < 1024)))
    val again = df.collect().map(_.getSeq[Long](0))
    assert(rows.toSeq == again.toSeq)
  }

  test("bloomPrefilterCensus: finds planted dups, false positives bounded") {
    val index = (0 until 200).map(i => (i.toLong, s"indexed document $i"))
      .toDF("doc_id", "text")
    val probe = ((0 until 20).map(i => (1000L + i, s"indexed document $i")) ++
      (0 until 180).map(i => (2000L + i, s"novel probe document $i")))
      .toDF("doc_id", "text")
    val r = Sketches.bloomPrefilterCensus(index, probe, "doc_id", "text",
      m = 1 << 14, kH = 5).head()
    assert(r.getLong(0) == 200L) // n_probe
    assert(r.getLong(2) == 20L, s"true dups ${r.getLong(2)}") // all planted found
    assert(r.getLong(1) >= 20L) // pass ⊇ true dups (no false negatives)
    assert(r.getLong(3) <= 10L, s"false positives ${r.getLong(3)}")
  }

  test("kmvSetOpsCensus: under-full sketches recover EXACT set algebra") {
    val a = (1L to 10L).toDF("k")
    val b = (6L to 15L).toDF("k")
    val r = Sketches.kmvSetOpsCensus(a, b, "k", k = 256).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 10L, 5L, 15L)))
    // sketch holds every hash → estimates collapse to the exact values
    assert(r.getDouble(4) == math.rint(5.0 / 15.0 * 10000) / 10000)
    assert(r.getDouble(5) == 5.0 && r.getDouble(6) == 15.0)
  }

  test("kmvSetOpsCensus: full sketches estimate within a loose band") {
    val orders = Q.t(spark, sfDir("0.01"), "orders")
    val r = Sketches.kmvSetOpsCensus(
      orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
      orders.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"),
      "o_custkey", k = 256).head()
    val (inter, union) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
    assert(math.abs(r.getDouble(5) - inter) / inter < 0.3,
      s"inter_est ${r.getDouble(5)} vs $inter")
    assert(math.abs(r.getDouble(6) - union) / union < 0.3,
      s"union_est ${r.getDouble(6)} vs $union")
  }

  test("kmvTrailingDistinct: window union of day sketches, exact when under-full") {
    import java.sql.Timestamp
    val rows = ((1 to 10).map(u => (Timestamp.valueOf("2024-03-01 10:00:00"), u.toLong)) ++
      (6 to 15).map(u => (Timestamp.valueOf("2024-03-02 10:00:00"), u.toLong)) ++
      (1 to 3).map(u => (Timestamp.valueOf("2024-03-04 10:00:00"), u.toLong)))
      .toDF("ts", "user_id")
    val out = Sketches.kmvTrailingDistinct(rows, "ts", "user_id",
      windowDays = 2, k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // under-full sketches → estimates are exact
    assert(out("2024-03-01") == ((10L, 10.0)))
    assert(out("2024-03-02") == ((15L, 15.0))) // union of days 1-2
    assert(out("2024-03-04") == ((3L, 3.0))) // day 3 empty, window covers 3-4
  }

  test("kmvCensusIncremental == batch kmvCensus (merge never re-reads state)") {
    val orders = Q.t(spark, sfDir("0.01"), "orders")
    val cut = to_timestamp(lit("1998-01-01"))
    val batch = Sketches.kmvCensus(orders, "o_orderpriority", "o_custkey")
      .collect().toSeq
    val inc = Sketches.kmvCensusIncremental(
      orders.filter(col("o_orderdate") < cut),
      orders.filter(col("o_orderdate") >= cut),
      "o_orderpriority", "o_custkey").collect().toSeq
    assert(inc == batch)
  }

  test("countMinCensusIncremental == batch (cell-wise counter addition)") {
    val docs = Q.t(spark, sfDir("0.01"), "documents")
    val batch = Sketches.countMinCensus(docs, "text").collect().toSeq
    val inc = Sketches.countMinCensusIncremental(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text").collect().toSeq
    assert(inc == batch)
  }

  test("kmvCensusProd (x178, xxhash64 in the estimator's 2^60 range): " +
    "exact counts hash-independent, under-full shards recover exactly") {
    val orders = Q.t(spark, sfDir("0.01"), "orders").limit(3000)
    val portable = Sketches.kmvCensus(orders, "o_orderpriority", "o_custkey")
      .collect()
    val prod = Sketches.kmvCensusProd(orders, "o_orderpriority", "o_custkey")
      .collect()
    assert(portable.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      prod.map(r => (r.getString(0), r.getLong(1))).toSeq,
      "exact counts must not depend on the hash")
    // hashes stay in the estimator's range and estimates are positive
    prod.foreach(r => assert(r.getDouble(2) > 0))
    // a k larger than any shard's distinct count → |sketch| < k →
    // estimate == exact for EVERY shard, any hash family
    val wide = Sketches.kmvCensusProd(orders.limit(300), "o_orderpriority",
      "o_custkey", k = 100000).collect()
    wide.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble,
        s"under-full sketch must be exact for ${r.getString(0)}")
    }
  }

  test("countMinCensusProd (x185, xxhash64 positions): exact counts are " +
    "hash-independent, CMS invariants hold, wide grid recovers exactly") {
    val docs = Q.t(spark, sfDir("0.01"), "documents").limit(200)
    val portable = Sketches.countMinCensus(docs, "text").collect()
    val prod = Sketches.countMinCensusProd(docs, "text").collect()
    // the token census (token, n_exact) is hash-independent — only the
    // estimates may differ between the portable twin and production hash
    assert(portable.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      prod.map(r => (r.getString(0), r.getLong(1))).toSeq)
    prod.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"est < exact for ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // a wide grid removes collisions for BOTH hash families
    val wide = Sketches.countMinCensusProd(docs, "text", width = 1 << 20,
      depth = 3, topK = 10).collect()
    assert(wide.forall(_.getLong(3) == 0L))
  }

  test("kmvCensusIncrementalProd (x186): incremental == batch prod census; " +
    "exact counts hash-independent") {
    val orders = Q.t(spark, sfDir("0.01"), "orders").limit(3000)
      .localCheckpoint(true)
    val cut = to_timestamp(lit("1998-01-01"))
    val batchProd = Sketches.kmvCensusProd(orders, "o_orderpriority",
      "o_custkey").collect().toSeq
    val incProd = Sketches.kmvCensusIncrementalProd(
      orders.filter(col("o_orderdate") < cut),
      orders.filter(col("o_orderdate") >= cut),
      "o_orderpriority", "o_custkey").collect().toSeq
    // mergeability holds for the production hash exactly as for md5
    assert(incProd == batchProd)
    // the exact-count column never depends on the hash family
    val portable = Sketches.kmvCensusIncremental(
      orders.filter(col("o_orderdate") < cut),
      orders.filter(col("o_orderdate") >= cut),
      "o_orderpriority", "o_custkey").collect()
    assert(portable.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      incProd.map(r => (r.getString(0), r.getLong(1))))
  }

  test("kmvSetOpsCensusProd (x190): exact set algebra hash-independent; " +
    "under-full sketches recover exactly") {
    val a = (1L to 10L).toDF("k")
    val b = (6L to 15L).toDF("k")
    val r = Sketches.kmvSetOpsCensusProd(a, b, "k", k = 256).head()
    // under-full → the sketch holds every hash and the estimates collapse
    // to the exact values for ANY hash family
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 10L, 5L, 15L)))
    assert(r.getDouble(5) == 5.0 && r.getDouble(6) == 15.0)
    // full sketches: exact columns identical across hash families
    val orders = Q.t(spark, sfDir("0.01"), "orders").localCheckpoint(true)
    val ka = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    val kb = orders.filter(col("o_orderpriority") === "5-LOW")
      .select("o_custkey")
    val prod = Sketches.kmvSetOpsCensusProd(ka, kb, "o_custkey", k = 256).head()
    val port = Sketches.kmvSetOpsCensus(ka, kb, "o_custkey", k = 256).head()
    assert((prod.getLong(0), prod.getLong(1), prod.getLong(2),
      prod.getLong(3)) ==
      ((port.getLong(0), port.getLong(1), port.getLong(2), port.getLong(3))))
    // estimates stay in a sane band under the production hash too
    val (inter, union) = (prod.getLong(2).toDouble, prod.getLong(3).toDouble)
    assert(math.abs(prod.getDouble(5) - inter) / inter < 0.3)
    assert(math.abs(prod.getDouble(6) - union) / union < 0.3)
  }

  test("bloomPrefilterCensusProd (x179): true dups hash-independent, " +
    "no false negatives, positions in range") {
    val index = (0 until 200).map(i => (i.toLong, s"indexed document $i"))
      .toDF("doc_id", "text")
    val probe = ((0 until 20).map(i => (1000L + i, s"indexed document $i")) ++
      (0 until 180).map(i => (2000L + i, s"novel probe document $i")))
      .toDF("doc_id", "text")
    val prod = Sketches.bloomPrefilterCensusProd(index, probe, "doc_id",
      "text", m = 1 << 14, kH = 5).head()
    val port = Sketches.bloomPrefilterCensus(index, probe, "doc_id",
      "text", m = 1 << 14, kH = 5).head()
    // n_probe and n_true_dup come from the exact verify — identical for
    // any hash family; only the false-positive count may differ
    assert(prod.getLong(0) == port.getLong(0))
    assert(prod.getLong(2) == port.getLong(2) && prod.getLong(2) == 20L)
    assert(prod.getLong(1) >= 20L, "bloom pass must contain every true dup")
    assert(prod.getLong(3) <= 10L, s"false positives ${prod.getLong(3)}")
    // prod positions stay inside [0, m)
    val pos = Seq("alpha", "beta").toDF("t")
      .select(Sketches.bloomPositionsProd(col("t"), m = 1 << 10, kH = 5)
        .as("p")).collect().map(_.getSeq[Long](0))
    assert(pos.forall(p => p.length == 5 && p.forall(x => x >= 0 && x < 1024)))
  }

  test("kmvTrailingDistinctProd (x192): exact counts hash-independent; " +
    "under-full windows recover exactly") {
    import java.sql.Timestamp
    val rows = ((1 to 10).map(u => (Timestamp.valueOf("2024-03-01 10:00:00"), u.toLong)) ++
      (6 to 15).map(u => (Timestamp.valueOf("2024-03-02 10:00:00"), u.toLong)))
      .toDF("ts", "user_id")
    val prod = Sketches.kmvTrailingDistinctProd(rows, "ts", "user_id",
      windowDays = 2, k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // under-full sketches → estimates exact for ANY hash family
    assert(prod("2024-03-01") == ((10L, 10.0)))
    assert(prod("2024-03-02") == ((15L, 15.0)))
    // full sketches on real data: n_exact identical across hash families
    val ev = Q.t(spark, sfDir("0.01"), "events").limit(20000)
      .localCheckpoint(true)
    val p = Sketches.kmvTrailingDistinctProd(ev, "ts", "user_id",
      windowDays = 7, k = 64).collect()
    val m = Sketches.kmvTrailingDistinct(ev, "ts", "user_id",
      windowDays = 7, k = 64).collect()
    assert(p.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      m.map(r => (r.getString(0), r.getLong(1))).toSeq)
    p.foreach(r => assert(r.getDouble(2) > 0))
  }

  test("countMinCensusIncrementalProd (x194): incremental == batch prod " +
    "census; exact token counts hash-independent") {
    val docs = Q.t(spark, sfDir("0.01"), "documents").limit(300)
      .localCheckpoint(true)
    val batchProd = Sketches.countMinCensusProd(docs, "text").collect().toSeq
    val incProd = Sketches.countMinCensusIncrementalProd(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text").collect().toSeq
    // cell-wise counter addition merges identically under either hash
    assert(incProd == batchProd)
    val portable = Sketches.countMinCensusIncremental(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text").collect()
    assert(portable.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      incProd.map(r => (r.getString(0), r.getLong(1))))
    incProd.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  test("countMinCensus: est >= exact always; unique tokens recover exactly") {
    val docs = Seq(
      (1L, "apple apple banana  Cherry"), // double space + case folding
      (2L, "apple date")
    ).toDF("doc_id", "text")
    val rows = Sketches.countMinCensus(docs, "text", width = 4, depth = 3,
      topK = 10).collect()
    val byTok = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byTok.keySet == Set("apple", "banana", "cherry", "date"))
    assert(byTok("apple")._1 == 3L)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"est < exact for ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // width large enough that nothing collides → zero overcount everywhere
    val wide = Sketches.countMinCensus(docs, "text", width = 1 << 12,
      depth = 3, topK = 10).collect()
    assert(wide.forall(_.getLong(3) == 0L))
  }

  test("bloom census survives an all-negative probe set (no null counts)") {
    val index = Seq((1L, "only one")).toDF("doc_id", "text")
    val probe = Seq((2L, "definitely absent")).toDF("doc_id", "text")
    val r = Sketches.bloomPrefilterCensus(index, probe, "doc_id", "text").head()
    assert(r.getLong(0) == 1L && !r.isNullAt(2) && r.getLong(3) >= 0L)
  }

  test("joinCardinalityEstimate: under-full sample is exact; subsample " +
    "lands within a sane band") {
    import spark.implicits._
    // left counts: k1×3, k2×2, k3×1; right: k1×2, k3×4, k9×5 (k9 left-only
    // on the right) → exact join rows = 3·2 + 1·4 = 10
    val l = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    val r = (Seq.fill(2)(1L) ++ Seq.fill(4)(3L) ++ Seq.fill(5)(9L)).toDF("k")
    val full = Sketches.joinCardinalityEstimate(l, "k", r, "k", k = 100)
      .head()
    assert(full.getLong(0) == 10L) // exact_join_rows
    assert(full.getLong(1) == 4L) // union {1,2,3,9}
    assert(full.getLong(2) == 4L) // under-full sample holds every key
    assert(full.getDouble(3) == 4.0) // D-hat = sample size when under-full
    assert(full.getDouble(4) == 10.0) // estimate collapses to exact
    assert(full.getDouble(5) == 0.0)
    // a genuine subsample on a larger skewed profile: estimate within 3×
    val rng = new scala.util.Random(5)
    val big = (1 to 20000).map(_ => math.abs(rng.nextInt(2000)).toLong + 1)
      .toDF("k")
    val est = Sketches.joinCardinalityEstimate(big, "k", big, "k", k = 256)
      .head()
    val exact = est.getLong(0).toDouble
    val guess = est.getDouble(4)
    assert(guess > exact / 3 && guess < exact * 3,
      s"estimate $guess vs exact $exact")
  }
}
