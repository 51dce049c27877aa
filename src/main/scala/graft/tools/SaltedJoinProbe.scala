package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** q187 probe. r6/r7 use: variance adjudication of the blanket salted join
  * (identical plans, 19–123 s rep spread → cold-disk tail, PERF.md). r8
  * use (VERDICT r7 #1): the TARGETED hot-key rewrite vs the old BLANKET
  * form, timed AND with per-variant shuffle-write dataSize totals — the
  * committed evidence that targeting drops the ×salts probe-side
  * replication (~8× less shuffle write at 100×).
  *
  * Variants: targeted (the registered q187 form — hot keys 1..64, cold
  * span plain), blanket (the r1-r7 form: every row salted, orders ×8),
  * plain (no mitigation baseline).
  *
  * Usage: runMain graft.tools.SaltedJoinProbe [dir] [reps]
  */
object SaltedJoinProbe {

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: collectPlan(a.executedPlan)
    case q: QueryStageExec => q +: collectPlan(q.plan)
    case o => o +: o.children.flatMap(collectPlan)
  }

  private def shuffleWriteBytes(df: DataFrame): Long =
    collectPlan(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s.metrics("dataSize").value }
      .sum

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.quiet(GraftSession.local("salted-probe"))

    def sides(): (DataFrame, DataFrame) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .hint("SHUFFLE_HASH")
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
      (li, o)
    }
    def agg(j: DataFrame): DataFrame =
      j.groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "targeted" -> (() => {
        val (li, o) = sides()
        agg(graft.ext.LakeOps.saltedJoin(li, o, "o_orderkey",
          rowIdCols = Seq("o_orderkey", "l_linenumber"), salts = 8,
          hotKeys = Some((1L to 64L))))
      }),
      "blanket" -> (() => {
        val (li, o) = sides()
        agg(graft.ext.LakeOps.saltedJoinAll(li, o, "o_orderkey",
          rowIdCols = Seq("o_orderkey", "l_linenumber"), salts = 8))
      }),
      "plain" -> (() => {
        val (li, o) = sides()
        agg(li.join(o, Seq("o_orderkey")))
      }))
    variants.foreach { case (label, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warm plan/JIT/cache
      System.gc()
      var bytes = 0L
      val ts = (1 to reps).map { _ =>
        val df = mk()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        bytes = shuffleWriteBytes(df)
        System.gc()
        dt
      }
      println(f"[$label] ${ts.map(t => f"$t%.1f").mkString(" ")}  " +
        f"min=${ts.min}%.1f max=${ts.max}%.1f spread=${ts.max / ts.min}%.2f " +
        f"shuffle_write=${bytes / 1e9}%.2f GB")
    }
    spark.stop()
  }
}
