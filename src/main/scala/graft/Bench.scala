package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - results are forced through the noop datasource (full materialization;
  *    `count()` would let Catalyst prune the work under measurement);
  *  - one warm-up pass at sf0.001 first (JIT + codegen caches), so timings
  *    reflect steady-state execution, not JVM warm-up;
  *  - session uses graft's canonical conf (AQE on, shuffle.partitions=32).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // driver contract: env var; args override for local runs (the sbt thin
    // client does not forward the caller's environment to the forked JVM)
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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
          // a crashing query must not silently improve the total: record it
          // in the JSON (failed list + sentinel time), not just on stderr
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          return FailSentinelSec
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.all.map(_.name)
    names.foreach(force(_, "/root/testdata/sf0.001")) // warm-up
    failed.clear() // warm-up failures re-surface in the timed runs
    // best-of-2 timed runs: single runs of sub-second queries are dominated
    // by scheduling/GC noise on a shared box
    val results = names.map(n => n -> math.min(force(n, sfDir), force(n, sfDir)))

    val qs = results
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // sbt's log decorator prefixes stdout with [info], which breaks the
    // driver's JSON-line parser — emit the bare line on stderr (unwrapped
    // by sbt) AND to a known file, as well as stdout for human runs
    System.err.println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_bench.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }

  /** Sentinel recorded for a failed query (large, so a crash can never read
    * as a speedup).
    */
  val FailSentinelSec = 9999.0
}
