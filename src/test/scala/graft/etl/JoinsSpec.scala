package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** saltedJoin: result-equivalence with the plain join on a skewed fixture
  * (one key carrying most of the fact side), for inner and left joins,
  * including unmatched and null-key rows.
  */
class JoinsSpec extends SparkSpec {

  private def skewedFixture = {
    import spark.implicits._
    // 90% of fact rows on key 1 (the "bot user"), plus an unmatched key and
    // a null key
    val facts = ((1 to 900).map(i => (Some(1L), s"evt$i")) ++
      (1 to 50).map(i => (Some(2L), s"b$i")) ++
      (1 to 50).map(i => (Some(99L), s"orphan$i")) ++
      Seq((Option.empty[Long], "nullkey"))).toDF("user_id", "payload")
    val dim = Seq((1L, "bot"), (2L, "human"), (3L, "lurker"))
      .toDF("user_id", "kind")
    (facts, dim)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("saltedJoin(inner) equals the plain inner join on a skewed key") {
    val (facts, dim) = skewedFixture
    val plain = facts.join(dim, Seq("user_id"), "inner")
    val salted = Joins.saltedJoin(facts, dim, Seq("user_id"), "inner", salts = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(canon(salted) == canon(plain))
    assert(plain.count() == 950)
  }

  test("saltedJoin(left) keeps unmatched and null-key rows exactly once") {
    val (facts, dim) = skewedFixture
    val plain = facts.join(dim, Seq("user_id"), "left")
    val salted = Joins.saltedJoin(facts, dim, Seq("user_id"), "left", salts = 8)
    assert(canon(salted) == canon(plain))
    assert(salted.count() == 1001)
    assert(salted.filter(col("user_id").isNull).count() == 1)
    assert(salted.filter(col("user_id") === 99L && col("kind").isNull)
      .count() == 50)
  }

  test("saltedJoin rejects right/outer joins (replication would duplicate)") {
    val (facts, dim) = skewedFixture
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(facts, dim, Seq("user_id"), "right")
    }
  }

  test("hot-key rows actually spread across salt sub-keys") {
    val (facts, _) = skewedFixture
    // recompute the deterministic salt expression the operator uses and
    // check the hot key's 900 rows land on >1 sub-key
    val spread = facts
      .filter(col("user_id") === 1L)
      .withColumn("_salt",
        pmod(xxhash64(facts.columns.map(col): _*), lit(8L)))
      .select(countDistinct(col("_salt")))
      .head().getLong(0)
    assert(spread > 4, s"hot key concentrated on $spread/8 sub-keys")
  }

  test("uniqueCol spreads BYTE-IDENTICAL duplicate rows (the degenerate " +
    "hot-key shape hash-of-row cannot spread)") {
    import spark.implicits._
    // 800 byte-identical events for one user — hash-of-all-columns puts all
    // of them on ONE salt sub-key; salting on the unique id must spread them
    val facts = (1 to 800).map(i => (i.toLong, 1L, "click"))
      .toDF("event_id", "user_id", "action")
    val dim = Seq((1L, "bot")).toDF("user_id", "kind")

    val identical = facts.drop("event_id") // byte-identical duplicates
    val noSpread = identical
      .withColumn("_salt",
        pmod(xxhash64(identical.columns.map(col): _*), lit(8L)))
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(noSpread == 1L, "identical rows should collapse to one sub-key")

    val withId = facts
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8L)))
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(withId == 8L, s"unique-id salt used $withId/8 sub-keys")

    // and the operator stays result-equivalent with uniqueCol set
    val plain = facts.join(dim, Seq("user_id"), "inner")
    val salted = Joins.saltedJoin(facts, dim, Seq("user_id"), "inner",
      salts = 8, uniqueCol = Some("event_id"))
    assert(canon(salted) == canon(plain))
  }

  test("uniqueCol sidesteps hash-rejected column types (map)") {
    import spark.implicits._
    val facts = Seq((1L, 7L, Map("a" -> 1)), (2L, 7L, Map("b" -> 2)))
      .toDF("id", "k", "attrs")
    val dim = Seq((7L, "x")).toDF("k", "v")
    // hash-of-all-columns fails analysis on MapType; uniqueCol works
    intercept[Exception] {
      Joins.saltedJoin(facts, dim, Seq("k"), "inner").collect()
    }
    val ok = Joins.saltedJoin(facts, dim, Seq("k"), "inner",
      uniqueCol = Some("id"))
    assert(ok.count() == 2)
  }

  test("intervalJoin equals the naive non-equi join, with no duplicate pairs") {
    import spark.implicits._
    // intervals of varied length (1 to 40) across bucket boundaries,
    // including touching endpoints and nested/overlapping windows
    val intervals = (0L until 50L)
      .map(i => (i, i * 7 % 100, i * 7 % 100 + (i % 5) * 10))
      .toDF("window_id", "lo", "hi")
    val points = (0L until 300L).map(p => (p, p % 120)).toDF("point_id", "d")
    val bucketized = Joins
      .intervalJoin(points, "d", intervals, "lo", "hi", bucketWidth = 8)
      .select("point_id", "window_id")
    val naive = points.join(intervals,
        col("d") >= col("lo") && col("d") <= col("hi"))
      .select("point_id", "window_id")
    assert(bucketized.count() == naive.count(),
      "bucket expansion must not duplicate or drop pairs")
    assert(bucketized.except(naive).isEmpty && naive.except(bucketized).isEmpty)
  }

  test("intervalJoin refuses colliding column names") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("d", "x")
    val b = Seq((1L, 2L, 3L)).toDF("lo", "hi", "x")
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(a, "d", b, "lo", "hi", 4)
    }
  }
}
