package graft.functions

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.functions._

class JaccardSimilaritySpec extends SparkSpec {

  test("native matches composable form on random long arrays (incl. edge sizes)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (0 until 300).map { i =>
      val n = rng.nextInt(40)
      val m = rng.nextInt(40)
      (Seq.fill(n)(rng.nextInt(60).toLong).distinct,
        Seq.fill(m)(rng.nextInt(60).toLong).distinct)
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+ ((Seq(1L), Seq.empty[Long]))
    val df = rows.toDF("a", "b")
    val out = df.select(
      Dedup.jaccard(col("a"), col("b")).as("native"),
      Dedup.jaccardComposable(col("a"), col("b")).as("composable"))
    assert(out.filter(col("native") =!= col("composable")).count() == 0)
    assert(out.filter(col("native").isNull =!= col("composable").isNull).count() == 0)
  }

  test("string arrays via the generic path; SQL registration") {
    import spark.implicits._
    Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .createOrReplaceTempView("js_t")
    val r = spark.sql("SELECT jaccard_similarity(x, y) FROM js_t").head()
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
  }

  test("null input yields null") {
    import spark.implicits._
    val d = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
      .select(Dedup.jaccard(col("a"), col("b")).as("j"))
    assert(d.head().isNullAt(0))
  }
}
