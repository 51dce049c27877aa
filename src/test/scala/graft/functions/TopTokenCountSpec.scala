package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopTokenCountSpec extends SparkSpec {

  test("top_token_count: hand cases incl. empty, null, null elements") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b", "a", "c", "a"))), // a×3
      (2L, Some(Seq("x"))),                     // single
      (3L, Some(Seq.empty[String])),            // empty → 0
      (4L, None),                               // null array → null
      (5L, Some(Seq("t", "t", "u", "u")))       // tie → the max count
    ).toDF("id", "toks")
    val out = df
      .select(col("id"), call_function("top_token_count", col("toks")).as("c"))
      .orderBy("id")
      .collect()
    assert(out.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq ===
      Seq(3L, 1L, 0L, -1L, 2L))
  }

  test("top_token_count: null elements count as one distinct value") {
    import spark.implicits._
    val df = Seq((1L, Seq[String](null, null, null, "a")))
      .toDF("id", "toks")
    assert(df.select(call_function("top_token_count", col("toks")))
      .head().getLong(0) === 3L)
  }

  test("token_stats matches the composable array expressions on corpus text") {
    val docs = spark.read.parquet(s"${sfDir()}/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("_t"))
      .filter(size(col("_t")) > 0)
    val native = docs.select(col("doc_id"),
        call_function("token_stats", col("_t")).as("_ts"))
      .select(col("doc_id"), col("_ts.n_words").as("nw"),
        col("_ts.n_distinct").as("nd"), col("_ts.chars").as("ch"),
        col("_ts.top_cnt").as("tc"))
    val composable = docs.select(col("doc_id"),
      size(col("_t")).cast("long").as("nw"),
      size(array_distinct(col("_t"))).cast("long").as("nd"),
      aggregate(col("_t"), lit(0L), (a, t) => a + length(t)).as("ch"),
      call_function("top_token_count", col("_t")).as("tc"))
    val diff = native.alias("a").join(composable.alias("b"), "doc_id")
      .filter(col("a.nw") =!= col("b.nw") || col("a.nd") =!= col("b.nd") ||
        col("a.ch") =!= col("b.ch") || col("a.tc") =!= col("b.tc"))
    assert(diff.count() === 0L)
    assert(native.count() > 0L)
  }

  test("token_stats: empty array and null input") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "toks")
      .select(col("id"), call_function("token_stats", col("toks")).as("s"))
      .orderBy("id").collect()
    assert(df(0).getStruct(1).toSeq === Seq(0L, 0L, 0L, 0L))
    assert(df(1).isNullAt(1))
  }

  test("top_token_count matches the explode→groupBy formulation on corpus text") {
    val docs = spark.read.parquet(s"${sfDir()}/documents.parquet")
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("_t"))
      .filter(size(col("_t")) > 0)
    val native = docs.select(col("doc_id"),
      call_function("top_token_count", col("_t")).as("c"))
    val relational = docs
      .select(col("doc_id"), explode(col("_t")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id").agg(max("_c").as("c"))
    val joined = native.alias("n")
      .join(relational.alias("r"), "doc_id")
      .filter(col("n.c") =!= col("r.c"))
    assert(joined.count() === 0L)
    assert(native.count() > 0L)
  }
}
