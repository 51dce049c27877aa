package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The measurement behind SplitDistinctAggregates' GROUPED scope (r6):
  * a per-source profile — 3 distinct sets + a plain count over documents —
  * timed with the grouped split ON (narrow per-branch scans + null-safe
  * key join) vs OFF (Spark's RewriteDistinctAggregates Expand, which
  * replays the scan ×4 through every buffer).
  *
  * Usage: runMain graft.tools.SplitDistinctBench [dir] [reps]
  */
object SplitDistinctBench {

  private def docsProfile(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source")
      .agg(
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(md5(col("text").cast("binary"))).as("n_unique_texts"),
        count_distinct(length(col("text"))).as("n_distinct_lengths"),
        count(lit(1)).cast("long").as("n_docs"))

  /** Wide-GROUP-KEY profile (ADVICE r7): numeric distinct sets grouped by
    * the raw text column — the shape where the auto gate's
    * distinct-inputs-only scope could hide a loss. Expand replicates the
    * wide key ×(n+1) through the shuffle; split re-reads it per branch
    * but ships it only ×n.
    */
  private def wideKeyProfile(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("text")
      .agg(
        count_distinct(col("doc_id")).as("d_ids"),
        count_distinct(col("n_chars")).as("d_len"),
        count(lit(1)).cast("long").as("n"))

  /** JOIN-CHILD profile (r7 VERDICT #9): multi-distinct over a joined
    * input — the shape the rule's scan-shaped guard refuses to split
    * (duplicating a join per branch re-runs the join n times). Measured
    * here as Spark's Expand lowering vs a HAND-WRITTEN split (each branch
    * its own join + single-distinct agg, equi-joined back on the group
    * key) so the guard decision rests on a number, not a guess.
    */
  private def joinChildExpand(spark: SparkSession, dir: String) = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    li.join(o, Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count_distinct(col("l_partkey")).as("d_part"),
        count_distinct(col("l_suppkey")).as("d_supp"),
        count_distinct(col("l_extendedprice")).as("d_price"),
        count(lit(1)).cast("long").as("n"))
  }

  private def joinChildSplit(spark: SparkSession, dir: String) = {
    def branch(valueCol: String, alias: String) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o_orderkey"), col(valueCol))
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
      li.join(o, Seq("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count_distinct(col(valueCol)).as(alias))
    }
    val b0 = branch("l_partkey", "d_part")
    val b1 = branch("l_suppkey", "d_supp")
    val b2 = branch("l_extendedprice", "d_price")
    val bn = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o_orderkey"))
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
      li.join(o, Seq("o_orderkey")).groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"))
    }
    b0.join(b1, Seq("o_orderpriority"))
      .join(b2, Seq("o_orderpriority"))
      .join(bn, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("d_part"), col("d_supp"),
        col("d_price"), col("n"))
  }

  private def lineitemProfile(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(
        count_distinct(col("l_partkey")).as("d_part"),
        count_distinct(col("l_suppkey")).as("d_supp"),
        count_distinct(col("l_extendedprice")).as("d_price"),
        count_distinct(col("l_orderkey")).as("d_order"),
        count(lit(1)).cast("long").as("n"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.quiet(GraftSession.local("split-distinct-bench"))
    def timeIt(flag: String,
        profile: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Seq[Double] = {
      spark.conf.set("spark.graft.splitDistinctAggregates.grouped", flag)
      // warm-up (plan + JIT)
      profile(spark, dir).write.format("noop").mode("overwrite").save()
      (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        profile(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(" ")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq("docs(string-derived)" -> (docsProfile _),
      "lineitem(numeric-cols)" -> (lineitemProfile _),
      "wide-group-key(text)" -> (wideKeyProfile _)).foreach {
      case (label, p) =>
        val on = timeIt("true", p)
        val off = timeIt("false", p)
        println(f"[$label ON ] ${fmt(on)} median ${med(on)}%.2f")
        println(f"[$label OFF] ${fmt(off)} median ${med(off)}%.2f")
        results(s"${label}_split_on") = med(on)
        results(s"${label}_split_off") = med(off)
    }
    // join-child adjudication: the flag is irrelevant (the rule's
    // scan-shaped guard refuses either way) — the comparison is Spark's
    // Expand vs the hand-written per-branch join split
    Seq("join-child(Expand)" -> (joinChildExpand _),
      "join-child(hand-split)" -> (joinChildSplit _)).foreach {
      case (label, p) =>
        val ts = timeIt("auto", p)
        println(f"[$label] ${fmt(ts)} median ${med(ts)}%.2f")
        results(label) = med(ts)
    }
    val json = results.map { case (k, v) => s""""$k": ${f"$v%.2f"}""" }
      .mkString("{\"metric\": \"split_distinct_profiles\", \"dir\": \"" +
        dir + "\", ", ", ", "}")
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SPLITDISTINCT_r08.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
