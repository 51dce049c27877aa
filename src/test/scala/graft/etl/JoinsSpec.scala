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
}
