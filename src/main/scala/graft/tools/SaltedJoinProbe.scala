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

  private def shuffleWriteBytes(p: SparkPlan): Long =
    collectPlan(p)
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
    // metrics come from the EXECUTED QueryExecution (listener): a noop
    // write plans its own execution, so reading metrics off the original
    // frame's plan yields zeros (the SkewDemo lesson)
    @volatile var lastPlan: SparkPlan = null
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          lastPlan = qe.executedPlan
          seen.incrementAndGet()
          ()
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val readouts = variants.map { case (label, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warm plan/JIT/cache
      System.gc()
      var bytes = 0L
      val ts = (1 to reps).map { _ =>
        val before = seen.get
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        var spins = 0
        while (seen.get == before && spins < 100) { Thread.sleep(100); spins += 1 }
        bytes = shuffleWriteBytes(lastPlan)
        System.gc()
        dt
      }
      println(f"[$label] ${ts.map(t => f"$t%.1f").mkString(" ")}  " +
        f"min=${ts.min}%.1f max=${ts.max}%.1f spread=${ts.max / ts.min}%.2f " +
        f"shuffle_write=${bytes / 1e9}%.2f GB")
      (label, ts.min, ts.max, bytes)
    }
    val json = readouts.map { case (l, lo, hi, b) =>
      s""""$l": {"min_sec": ${f"$lo%.2f"}, "max_sec": ${f"$hi%.2f"}, """ +
        s""""shuffle_write_gb": ${f"${b / 1e9}%.2f"}}"""
    }.mkString("{\"metric\": \"salted_join_probe\", \"dir\": \"" + dir +
      "\", ", ", ", "}")
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SALTEDJOIN_r08.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
