package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val big = Seq(
    (1L, 10L, "a"), (1L, 11L, "b"), (1L, 12L, "c"), // hot key 1
    (2L, 20L, "d"), (3L, 30L, "e") // no match for 3
  ).toDF("k", "rid", "payload")
  private val dim = Seq((1L, "one"), (2L, "two"), (4L, "four"))
    .toDF("k", "name")

  test("saltedJoin: row-for-row identical to the plain join (inner + left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(dim, Seq("k"), jt)
        .select("k", "rid", "payload", "name")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val salted = LakeOps.saltedJoin(big, dim, "k", Seq("rid"), salts = 4,
          joinType = jt)
        .select("k", "rid", "payload", "name")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoin: hot-key rows actually spread over multiple salts") {
    val hot = (1 to 256).map(i => (1L, i.toLong)).toDF("k", "rid")
    val salts = hot
      .withColumn("_salt", pmod(xxhash64(col("rid")), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"only $salts salts used") // 256 hashed rows → ~8
  }

  test("saltedJoin: shuffle/join keys carry the salt (plan pin)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = LakeOps.saltedJoin(big, dim, "k", Seq("rid"), salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), "salt column missing from the plan")
      // the dim side replicates through a single explode (Generate)
      assert(plan.contains("explode") || plan.contains("Generate"),
        "no explode on the replicated side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
