package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r11 probe: q134 fuzzy-linkage stage bisect. */
object X134Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.quiet(GraftSession.local("x134-probe"))
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val originals = spark.read.parquet(s"$dir/part.parquet")
      .selectExpr("p_partkey AS oid",
        "concat(p_name, '#', CAST(p_partkey AS STRING)) AS oname")
    val perturbed = originals
      .selectExpr("oid", "oname", "(oid % length(oname)) + 1 AS pos1")
      .selectExpr("oid AS pid",
        """concat(substring(oname, 1, pos1 - 1),
          |substring(oname, pos1 + 1, length(oname) - pos1)) AS pname"""
          .stripMargin.replace("\n", " "))
    val par = spark.sparkContext.defaultParallelism
    def sigs(t: org.apache.spark.sql.DataFrame, id: String, s: String) =
      t.repartition(par)
        .select(col(id),
          transform(sequence(lit(0), length(col(s))), i =>
            xxhash64(when(i === 0, col(s)).otherwise(concat(
              col(s).substr(lit(1), i - 1),
              col(s).substr(i + 1, length(col(s)) - i))))).as("_sigs"))
        .select(col(id), explode(col("_sigs")).as("_sig"))
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val lt = perturbed.select(col("pid").as("id_l"), col("pname").as("s_l"))
      val rt = originals.select(col("oid").as("id_r"), col("oname").as("s_r"))
      println("[probe] sigsL=" + timed("sigsL count")(sigs(lt, "id_l", "s_l").count()))
      println("[probe] sigsR=" + timed("sigsR count")(sigs(rt, "id_r", "s_r").count()))
      val cand = sigs(lt, "id_l", "s_l")
        .join(sigs(rt, "id_r", "s_r"), "_sig")
        .select("id_l", "id_r").distinct()
      println("[probe] cand=" + timed("cand count")(cand.count()))
      val ver = cand.join(lt, "id_l").join(rt, "id_r")
        .withColumn("edit_distance", levenshtein(col("s_l"), col("s_r"), 1))
        .filter(col("edit_distance") =!= -1)
      println("[probe] verified=" + timed("verify count")(ver.count()))
    }
    spark.stop()
  }
}
