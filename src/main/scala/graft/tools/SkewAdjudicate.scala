package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Adjudicates the sweep's `aqe_skew_applied: false` rows (VERDICT r8 #5):
  * for each flagged query's join key, run the keyProfile at the 100×
  * point and record the skew ratio (max·n_keys/total — 1.0 means
  * perfectly uniform). A ratio near 1 means "nothing to split": the flag
  * is the CORRECT AQE decision, not a missed optimization. The profiles:
  *
  *  - q90 / q150 / q187 join on the order key (orders ⋈ feed/delta,
  *    lineitem ⋈ orders): TPC-H-shaped, ≤ 7 lineitems per order;
  *  - x77 / x205 / x229 join on the 12-bit SRP bucket over embeddings
  *    (x205/x229 already salt any bucket above 65536 rows).
  *
  * Usage: runMain graft.tools.SkewAdjudicate [dir100]
  */
object SkewAdjudicate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val spark = GraftSession.quiet(GraftSession.local("skew-adjudicate"))

    def profile(name: String, df: org.apache.spark.sql.DataFrame,
        key: String): Unit = {
      val top = graft.ext.LakeOps.keyProfile(df, key, topK = 1).head()
      val n = df.count()
      println(f"[skew] $name: total=$n top_key_rows=${top.getLong(1)} " +
        f"top_pct=${top.getDouble(2)}%.6f skew_ratio=${top.getDouble(3)}%.3f")
    }

    val orders = graft.queries.Q.t(spark, dir, "orders")
    val li = graft.queries.Q.t(spark, dir, "lineitem")
    val e = graft.queries.Q.t(spark, dir, "embeddings")

    profile("q90_cdc_merge (orders.o_orderkey)",
      orders.select("o_orderkey"), "o_orderkey")
    profile("q150/q187 (lineitem.l_orderkey)",
      li.select("l_orderkey"), "l_orderkey")
    profile("x77/x205/x229 (SRP bucket, 12-bit)",
      e.select(graft.ext.Similarity.lshBucket(col("embedding"), 64, 12, 42L)
        .as("_bucket")), "_bucket")
    spark.stop()
  }
}
