package graft.etl

import graft.SparkSpec
import graft.analytics.{Bootstrap, MonteCarlo, Summary}
import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Degenerate inputs must degrade gracefully, not throw: empty frames,
  * all-garbage timestamps, all-null columns, single rows.
  */
class DegenerateInputSpec extends SparkSpec {

  private def emptyTraffic = {
    import spark.implicits._
    Seq.empty[(java.lang.Double, String, String, String, java.lang.Double,
      java.lang.Double, java.lang.Double, String, String, java.lang.Double)]
      .toDF(graft.schema.Schemas.trafficRaw.fieldNames.toIndexedSeq: _*)
  }

  test("clean on an empty frame returns an empty frame with the same columns") {
    val out = CleanTraffic(emptyTraffic)
    assert(out.count() == 0)
    assert(out.columns.toSeq == graft.schema.Schemas.trafficRaw.fieldNames.toSeq)
  }

  test("clean when every timestamp is garbage returns zero rows") {
    import spark.implicits._
    val raw = (1 to 20).map(i => (i.toDouble: java.lang.Double, "TBD",
      "London", "Camden", 5.0: java.lang.Double, 5.0: java.lang.Double,
      1.0: java.lang.Double, "Low", "Dry", 100.0: java.lang.Double))
      .toDF(graft.schema.Schemas.trafficRaw.fieldNames.toIndexedSeq: _*)
    assert(CleanTraffic(raw).count() == 0)
  }

  test("clean with an all-null numeric column leaves it all-null (no fill value exists)") {
    import spark.implicits._
    val raw = (1 to 10).map(i => (i.toDouble: java.lang.Double,
      "2024-01-01 10:00", "London", "Camden", null: java.lang.Double,
      50.0: java.lang.Double, 1.0: java.lang.Double, "Low", "Dry",
      100.0: java.lang.Double))
      .toDF(graft.schema.Schemas.trafficRaw.fieldNames.toIndexedSeq: _*)
    val out = CleanTraffic(raw)
    // >50% null fires the sequential drop path → all rows dropped for that col
    assert(out.count() == 0 || out.filter(col("vehicle_count").isNotNull).count() == 0)
  }

  test("merge with an empty weather side keeps all traffic rows (left join)") {
    import spark.implicits._
    val t = Seq((1.0, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      "London", "Camden", 5.0, 5.0, 1.0, "Low", "Dry", 100.0))
      .toDF(graft.schema.Schemas.trafficRaw.fieldNames.toIndexedSeq: _*)
    val w = CleanWeather(
      Seq.empty[(java.lang.Double, String, String, String, java.lang.Double,
        java.lang.Double, java.lang.Double, java.lang.Double, String, String)]
        .toDF(graft.schema.Schemas.weatherRaw.fieldNames.toIndexedSeq: _*))
    val m = MergeTrafficWeather(t, w)
    assert(m.count() == 1)
    assert(m.filter(col("weather_id").isNull).count() == 1)
  }

  test("bootstrap on empty / too-small input yields an empty result frame") {
    import spark.implicits._
    assert(Bootstrap(spark, Seq.empty[Double].toDF("x")).count() == 0)
    assert(Bootstrap(spark, (1 to 10).map(_.toDouble).toDF("x")).count() == 0) // ≤20 rows
  }

  test("monte carlo on a single-row frame still produces 4 scenarios") {
    import spark.implicits._
    val out = MonteCarlo.simulate(spark, Seq(100.0).toDF("volume"), nSimulations = 100)
    assert(out.count() == 4)
  }

  test("dedup & text ops on empty documents") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(docs, "doc_id", Seq("text")).count() == 0)
    assert(Dedup.minHashPairs(docs, "doc_id", "text").count() == 0)
    assert(docs.select(TextAnalysis.qualityScore(col("text"))).count() == 0)
  }

  test("describe on a frame with no numeric columns is empty") {
    import spark.implicits._
    val d = Seq("a").toDF("s")
    assert(Summary.describeNumeric(spark, d).isEmpty)
  }

  test("portable minhash/simhash on empty and empty-text documents") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minHashSignaturesPortable(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simHash(empty, "doc_id", "text",
      tokenHash = Dedup.portableHash60, nBits = 16).count() == 0)
    // whitespace-only text: no grams → no signature row; no tokens → no
    // simhash row (matching the explode-based round-1 behavior)
    val blank = Seq((1L, "   "), (2L, "real words here")).toDF("doc_id", "text")
    assert(Dedup.minHashSignaturesPortable(blank, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Dedup.simHash(blank, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("quantized SRP bucket on empty frame and null embedding") {
    import graft.ext.Similarity
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(empty.select(
      Similarity.lshBucketQuantized(col("embedding"), dim = 4, nBits = 4))
      .count() == 0)
    val withNull = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, null))
      .toDF("vec_id", "embedding")
    val buckets = withNull.select(col("vec_id"),
      Similarity.lshBucketQuantized(col("embedding"), dim = 4, nBits = 4)
        .as("bucket")).collect()
    assert(buckets.length == 2)
    assert(buckets.find(_.getLong(0) == 2L).exists(_.isNullAt(1)),
      "null embedding should yield null bucket, not throw")
  }

  test("saltedJoin with empty sides") {
    import spark.implicits._
    val facts = Seq((1L, "a")).toDF("k", "v")
    val emptyDim = Seq.empty[(Long, String)].toDF("k", "kind")
    assert(Joins.saltedJoin(facts, emptyDim, Seq("k"), "left").count() == 1)
    assert(Joins.saltedJoin(facts, emptyDim, Seq("k"), "inner").count() == 0)
    val emptyFacts = Seq.empty[(Long, String)].toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "kind")
    assert(Joins.saltedJoin(emptyFacts, dim, Seq("k"), "left").count() == 0)
  }

  test("writeBucketed on an empty frame produces a readable empty table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    graft.io.Layers.writeBucketed(empty, "graft_empty_bucketed", Seq("id"), 4)
    try assert(spark.table("graft_empty_bucketed").count() == 0)
    finally spark.sql("DROP TABLE IF EXISTS graft_empty_bucketed")
  }
}
