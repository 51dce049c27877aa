package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and report per-query seconds.
  *
  * Methodology:
  *  - results are forced through the noop datasource (full materialization;
  *    `count()` would let Catalyst prune the work under measurement);
  *  - one warm-up pass at sf0.001 first (JIT + codegen caches), so timings
  *    reflect steady-state execution, not JVM warm-up;
  *  - each query is timed over `Runs` (>=3) interleaved passes and the
  *    MEDIAN is reported — single runs of sub-second queries are dominated
  *    by scheduling/GC noise on a shared box, and best-of-2 (round 2)
  *    still left 2-3x swings unadjudicated;
  *  - session uses graft's canonical conf (AQE on, shuffle.partitions=32).
  *
  * Output contract (round-3 fix: the full 74-query dict outgrew the
  * driver's stdout tail capture in rounds 1-2, losing the total):
  *  - the FULL per-query detail (median + every raw run) is written to
  *    `bench_detail.json` in the working directory (and /tmp/graft_bench.json);
  *  - the LAST stdout line is a COMPACT summary
  *    `{"metric":"total","value":…,"unit":"sec","n":…,"failed":[…],"sf":…}`
  *    small enough to always survive tail capture; it is also emitted on
  *    stderr because sbt's log decorator prefixes stdout with [info].
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // driver contract: env var; args override for local runs (the sbt thin
    // client does not forward the caller's environment to the forked JVM)
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val runs = args.drop(1).headOption.map(_.toInt)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def force(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          return FailSentinelSec
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.all.map(_.name)
    names.foreach(force(_, "/root/testdata/sf0.001")) // warm-up
    failed.clear() // warm-up failures re-surface in the timed runs

    // `runs` interleaved timed passes (pass 1 over all queries, then pass 2,
    // ...) so a transient load spike on the box degrades one PASS, not one
    // QUERY's entire sample.
    val samples: Seq[Seq[(String, Double)]] =
      (1 to runs).map(_ => names.map(n => n -> force(n, sfDir)))
    val byQuery: Seq[(String, Seq[Double])] =
      names.map(n => n -> samples.map(_.toMap.apply(n)))

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2.0
    }
    // a query that failed ANY timed run is reported at the sentinel — a
    // crash must never read as a speedup (round-2 advice: min() defeated
    // the sentinel when only the second run crashed)
    val medians: Seq[(String, Double)] = byQuery.map { case (n, xs) =>
      n -> (if (failed.contains(n)) FailSentinelSec else median(xs))
    }

    val total = medians.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def dict(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val detail = dict(Seq(
      "metric" -> "\"total\"",
      "value" -> f"$total%.3f",
      "unit" -> "\"sec\"",
      "runs" -> runs.toString,
      "sf" -> ("\"" + sfDir + "\""),
      "failed" -> failedJson,
      "queries" -> dict(medians.map { case (k, v) => k -> f"$v%.3f" }),
      "raw_runs" -> dict(byQuery.map { case (k, xs) =>
        k -> xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      })
    ))
    for (p <- Seq("bench_detail.json", "/tmp/graft_bench.json"))
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (detail + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}") }

    // full detail first (humans / generous captures), compact summary LAST
    // so a bounded tail capture always recovers the total
    println(detail)
    val summary = dict(Seq(
      "metric" -> "\"total\"",
      "value" -> f"$total%.3f",
      "unit" -> "\"sec\"",
      "n" -> medians.size.toString,
      "runs" -> runs.toString,
      "failed" -> failedJson,
      "detail_file" -> "\"bench_detail.json\"",
      "sf" -> ("\"" + sfDir + "\"")
    ))
    System.err.println(summary)
    println(summary)
    spark.stop()
  }

  /** Sentinel recorded for a failed query (large, so a crash can never read
    * as a speedup).
    */
  val FailSentinelSec = 9999.0
}
