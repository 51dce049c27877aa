package graft.functions

import graft.SparkSpec
import graft.etl.{Cleaning, Joins}
import org.apache.spark.sql.functions._

class DeterministicModeSpec extends SparkSpec {

  test("mode_det: frequency winner; ties break to smallest value") {
    import spark.implicits._
    val d = Seq("b", "b", "a", "a", "c", null).toDF("x")
    assert(d.agg(GraftFunctions.modeDet(col("x"))).head().getString(0) == "a")
    val e = Seq("z", "z", "y").toDF("x")
    assert(e.agg(GraftFunctions.modeDet(col("x"))).head().getString(0) == "z")
  }

  test("mode_det in SQL, grouped, numeric types") {
    import spark.implicits._
    Seq((1, 5.0), (1, 5.0), (1, 2.0), (2, 7.0), (2, 3.0))
      .toDF("g", "v").createOrReplaceTempView("md_t")
    val r = spark.sql(
      "SELECT g, mode_det(v) AS m FROM md_t GROUP BY g ORDER BY g").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(5.0, 3.0)) // g=2 ties → smallest
  }

  test("mode_det agrees with the fused melt implementation (Cleaning.modes)") {
    val docs = graft.queries.Q.t(spark, sfDir(), "orders")
    val viaAgg = docs
      .agg(GraftFunctions.modeDet(col("o_orderpriority"))).head().getString(0)
    val viaMelt = Cleaning.modes(docs, Seq("o_orderpriority"))("o_orderpriority")
    assert(viaAgg == viaMelt)
  }

  test("mode_det survives partial aggregation across many partitions") {
    import spark.implicits._
    val d = spark.range(10000).select(
      (col("id") % 7).cast("string").as("x")).repartition(16)
    // ids 0..9999 % 7: values 0..4 appear 1429 times, 5,6 appear 1428
    assert(d.agg(GraftFunctions.modeDet(col("x"))).head().getString(0) == "0")
  }

  test("empty / all-null input yields null") {
    import spark.implicits._
    val d = Seq.empty[String].toDF("x")
    assert(d.agg(GraftFunctions.modeDet(col("x"))).head().isNullAt(0))
    val n = Seq(null: String, null: String).toDF("x")
    assert(n.agg(GraftFunctions.modeDet(col("x"))).head().isNullAt(0))
  }

  test("saltedJoin equals plain join on skewed keys (inner + left)") {
    import spark.implicits._
    // heavily skewed left: 90% of rows share one key
    val left = spark.range(2000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val right = Seq((1L, "hot"), (20L, "a"), (30L, "b"), (999999L, "miss"))
      .toDF("k", "label")
    Seq("inner", "left").foreach { how =>
      val plain = left.join(right, Seq("k"), how)
        .select("k", "payload", "label").collect()
        .map(_.toString).sorted.toSeq
      val salted = Joins.saltedJoin(left, right, Seq("k"), how, salts = 8)
        .select("k", "payload", "label").collect()
        .map(_.toString).sorted.toSeq
      assert(plain == salted, s"$how salted join diverged")
    }
  }
}
