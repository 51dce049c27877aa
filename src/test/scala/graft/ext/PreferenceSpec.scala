package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("pairwiseGamesFromScores: lower score wins, ties to lower id") {
    val df = Seq(
      ("g1", 1L, 5.0), ("g1", 2L, 3.0), ("g1", 3L, 3.0), // 2 beats 1; 2=3 tie→2; 3 beats 1
      ("g2", 1L, 1.0), ("g2", 2L, 9.0) // 1 beats 2
    ).toDF("grp", "item", "score")
    val games = Preference.pairwiseGamesFromScores(df, "grp", "item", "score")
      .as[(Long, Long)].collect().toSet
    assert(games == Set((2L, 1L), (2L, 3L), (3L, 1L), (1L, 2L)))
  }

  test("bradleyTerry: hand-computed 2-item fixpoint and zero-win rule") {
    // A(1) beats B(2) 3×, B beats A 1× → r_A=1.5, r_B=0.5 (exact fixpoint
    // reached at iteration 1: 3/(4/2) and 1/(4/2))
    val games = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)))
      .toDF("winner", "loser")
    val r = Preference.bradleyTerry(games, iters = 3, topK = 10)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (i, g, w, rt) => i -> ((g, w, rt)) }.toMap
    assert(r(1L) == ((4L, 3L, 1.5)))
    assert(r(2L) == ((4L, 1L, 0.5)))
    // an item that never wins converges to rating 0
    val g2 = Seq((1L, 2L), (1L, 2L)).toDF("winner", "loser")
    val r2 = Preference.bradleyTerry(g2, iters = 3, topK = 10)
      .filter(col("item") === 2L).select("rating").as[Double].head()
    assert(r2 == 0.0)
  }

  test("bradleyTerry: more wins against the same opposition ranks higher") {
    val games = (Seq.fill(5)((10L, 30L)) ++ Seq.fill(2)((30L, 10L)) ++
      Seq.fill(4)((20L, 30L)) ++ Seq.fill(3)((30L, 20L)))
      .toDF("winner", "loser")
    val order = Preference.bradleyTerry(games, iters = 5, topK = 10)
      .select("item").as[Long].collect().toSeq
    assert(order.head == 10L) // 5/7 vs 4/7 win rate vs the common opponent
  }

  test("bradleyTerry: cardinality guard throws above maxItems with a " +
    "pointer to the aggregated alternative (VERDICT r7 #6)") {
    val games = (1L to 20L).map(i => (i, i + 20L)).toDF("winner", "loser")
    val ex = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(games, maxItems = 10L)
    }
    assert(ex.getMessage.contains("maxItems"))
    assert(ex.getMessage.contains("bounded"))
    // at or under the bound it still runs
    assert(Preference.bradleyTerry(games, maxItems = 40L).count() > 0)
  }

  test("krippendorffAlpha: hand-computed mixed panel = 0.5") {
    // u1 {a,a}, u2 {a,b}, u3 {b,b,b}, u4 {a} (dropped: <2 ratings).
    // A2 = 4+0+6 = 10, n = 7, marginals a=3 b=4 → Σnc² = 25.
    // alpha = 1 − (n−1)(2n−A2)/(2(n²−Σnc²)) = 1 − 6·4/48 = 0.5
    val ratings = Seq(
      (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "a")
    ).toDF("unit", "cat")
    val r = Preference.krippendorffAlpha(ratings, "unit", "cat")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r == ((3L, 7L, 2L, 10L, 0.5)))
  }

  test("krippendorffAlpha: perfect agreement = 1, refuses inexact panels") {
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("unit", "cat")
    val r = Preference.krippendorffAlpha(perfect, "unit", "cat")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r._5 == 1.0)
    // a 4-rater unit with counts {2,1,1}: 2·Σn(n−1) = 4 not divisible by
    // m−1 = 3 — the operator must throw, not silently round
    val inexact = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"))
      .toDF("unit", "cat")
    assertThrows[IllegalArgumentException] {
      Preference.krippendorffAlpha(inexact, "unit", "cat").collect()
    }
  }
}
