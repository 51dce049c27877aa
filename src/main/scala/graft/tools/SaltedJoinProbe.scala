package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q187 variance adjudication probe (r6 VERDICT #2): the salted-join
  * census at 100× under different physical strategies, N reps each in ONE
  * session — the observed 19–123 s rep spread happens with identical
  * plans, so the suspect is execution-memory pressure from the
  * ShuffledHashJoin build of the 60M-row salted side at 32 partitions,
  * not an AQE decision (SCALE_r07 records aqe_skew_applied=false).
  *
  * Variants: shj (current registered form), smj (no hint), shj128 /
  * smj128 (pre-repartitioned to 128 (key,salt) partitions — smaller
  * per-task builds/sorts).
  *
  * Usage: runMain graft.tools.SaltedJoinProbe [dir] [reps]
  */
object SaltedJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.quiet(GraftSession.local("salted-probe"))

    def census(hint: Option[String], parts: Option[Int]): DataFrame = {
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val li1 = hint.fold(li0)(li0.hint(_))
      val li = parts.fold(li1)(p => li1.repartition(p,
        col("o_orderkey"),
        pmod(xxhash64(col("o_orderkey"), col("l_linenumber")), lit(8L))))
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
      graft.ext.LakeOps.saltedJoin(li, o, "o_orderkey",
          rowIdCols = Seq("o_orderkey", "l_linenumber"), salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    }

    val variants = Seq(
      "shj" -> (() => census(Some("SHUFFLE_HASH"), None)),
      "smj" -> (() => census(Some("MERGE"), None)),
      "shj128" -> (() => census(Some("SHUFFLE_HASH"), Some(128))),
      "smj128" -> (() => census(Some("MERGE"), Some(128))))
    variants.foreach { case (label, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warm plan/JIT
      System.gc()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc()
        dt
      }
      println(f"[$label] ${ts.map(t => f"$t%.1f").mkString(" ")}  " +
        f"min=${ts.min}%.1f max=${ts.max}%.1f spread=${ts.max / ts.min}%.2f")
    }
    spark.stop()
  }
}
