package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Group-key-cardinality crossover sweep for the GROUPED
  * SplitDistinctAggregates rewrite (r6 VERDICT #7): the same 3-distinct +
  * count profile over the 100× lineitem, grouped by `l_orderkey % C` for a
  * ladder of C values, timed with the grouped split ON vs OFF (Spark's
  * Expand). The hypothesis under test: branch-rescan wins at LOW group
  * cardinality (the Expand replays rows ×(n+1) through every buffer while
  * branch aggregates collapse to C rows) and loses once per-group partial
  * collapse does the work Expand-side.
  *
  * Usage: runMain graft.tools.SplitDistinctCardinalitySweep [dir] [reps] [outJson]
  */
object SplitDistinctCardinalitySweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val outJson = args.drop(2).headOption.getOrElse("SPLITDISTINCT_r07.json")
    val spark = GraftSession.quiet(GraftSession.local("split-card-sweep"))
    val cards = Seq(1L, 4L, 32L, 256L, 4096L, 65536L, 1048576L)

    def profile(c: Long) =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy((col("l_orderkey") % c).as("g"))
        .agg(
          count_distinct(col("l_partkey")).as("d_part"),
          count_distinct(col("l_suppkey")).as("d_supp"),
          count_distinct(col("l_extendedprice")).as("d_price"),
          count(lit(1)).cast("long").as("n"))

    def timeIt(flag: String, c: Long): Seq[Double] = {
      spark.conf.set("spark.graft.splitDistinctAggregates.grouped", flag)
      profile(c).write.format("noop").mode("overwrite").save() // warm
      (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        profile(c).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val rows = cards.map { c =>
      val on = timeIt("true", c)
      val off = timeIt("false", c)
      println(f"[card $c%7d] split ${med(on)}%.2f s (min ${on.min}%.2f)  " +
        f"expand ${med(off)}%.2f s (min ${off.min}%.2f)  " +
        f"ratio ${med(on) / med(off)}%.2f")
      (c, med(on), on.min, med(off), off.min)
    }
    val json = rows.map { case (c, onM, onMin, offM, offMin) =>
      f"""{"cardinality": $c, "split_median": $onM%.2f, "split_min": $onMin%.2f, """ +
        f""""expand_median": $offM%.2f, "expand_min": $offMin%.2f}"""
    }.mkString("""{"metric": "split_distinct_cardinality_sweep",""" +
      s""" "dir": "$dir", "reps": $reps, "points": [""", ", ", "]}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
