package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r11: operator-level formatted plans for sub-frames that the query-level
  * explain hides behind Materialized artifacts / eager checkpoints —
  * committed under plans/r11 so the round's plan claims stay checkable.
  *
  * Usage: runMain graft.tools.R11PlanDump [sfDir]
  */
object R11PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.quiet(GraftSession.local("r11-plandump"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    dump("prefixJaccardPairs (q140 operator body)",
      graft.ext.Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, minSim = 0.5))
    dump("knnGraphExact degree=6 (q258 graph build)",
      graft.ext.Similarity.knnGraphExact(e, "vec_id", "embedding", 6))
    dump("minHashSignaturesPortable (q25/q69/q74 signature pass)",
      graft.ext.Dedup.minHashSignaturesPortable(docs, "doc_id", "text", 16))
    spark.stop()
  }
}
