package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("markovTransitions: hand-computed matrix, ties broken by event id") {
    // user 1: A -> B -> A ; user 2: A -> A (two events, same ts, id order)
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "A"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "A"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val m = Behavior.markovTransitions(e, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("A", "B")) == (1L, 0.5)) // from A: one ->B, one ->A
    assert(m(("A", "A")) == (1L, 0.5))
    assert(m(("B", "A")) == (1L, 1.0))
    assert(!m.contains(("B", "B")))
  }

  test("cohortRetention: hand-computed two-cohort matrix") {
    // u1 active weeks 0,1,2 ; u2 weeks 0,2 ; u3 week 1 only
    def day(w: Int) = ts(f"1970-01-${w * 7 + 1}%02d 12:00:00")
    val e = Seq(
      (1L, day(0)), (1L, day(1)), (1L, day(2)),
      (2L, day(0)), (2L, day(2)),
      (3L, day(1))
    ).toDF("user_id", "ts")
    val r = Behavior.cohortRetention(e, "user_id", "ts")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    assert(r((0L, 0L))._3 == 2L) // cohort 0: u1,u2
    assert(r((0L, 1L))._3 == 1L) // only u1 in week 1
    assert(r((0L, 1L))._5 == 0.5)
    assert(r((0L, 2L))._3 == 2L) // both back in week 2
    assert(r((1L, 0L))._3 == 1L) // cohort 1: u3
    assert(!r.contains((1L, 1L)))
  }

  test("kaplanMeier: closed cohort with no censoring equals empirical survival") {
    // all users end well before the censor window: lifetimes 0,1,1,3 days;
    // last event day is max 10; censorDays 2 censors only users with
    // last > 8 — none once we add a sentinel user providing the max day
    // (lifetime 0 at day 20, censored at t=0? no: last=20 > 18 → censored)
    val e = Seq(
      (1L, ts("1970-01-01 00:00:00")), // lifetime 0, death
      (2L, ts("1970-01-01 00:00:00")), (2L, ts("1970-01-02 00:00:00")),
      (3L, ts("1970-01-03 00:00:00")), (3L, ts("1970-01-04 00:00:00")),
      (4L, ts("1970-01-02 00:00:00")), (4L, ts("1970-01-05 00:00:00")),
      (5L, ts("1970-01-20 00:00:00")) // defines max day; censored at t=0
    ).toDF("user_id", "ts")
    val out = Behavior.kaplanMeier(e, "user_id", "ts",
      censorDays = 2, horizons = Seq(0, 1, 3, 10))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // risk at t=0: 5 users (u5 censored at 0 still at risk for the t=0
    // deaths); d0=1 → S(0) = 1 - 1/5 = 0.8
    assert(out(0L)._3 == 0.8)
    // t=1: risk 3 (u1 dead, u5 censored), d=2 → S = 0.8 * (1/3)
    assert(math.abs(out(1L)._3 - 0.8 / 3.0) < 1e-6)
    // t=3: risk 1, d=1 → S = 0
    assert(out(3L)._3 == 0.0)
    assert(out(10L)._3 == 0.0)
    assert(out(10L)._2 == 3L) // three death steps total
  }

  test("giniByGroup: equality -> 0, one-takes-all -> (n-1)/n") {
    val eq = (1 to 10).map(i => ("g", i.toLong, 100L))
    val one = (1 to 9).map(i => ("h", i.toLong + 10, 0L)) :+ ("h", 20L, 500L)
    val df = (eq ++ one).toDF("g", "e", "cents")
    val out = Concentration.giniByGroup(df, "grp")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out("g") == 0.0)
    assert(out("h") == 0.9)
  }

  test("hhiByGroup: equal shares -> 1/n, monopoly -> 1") {
    val eqs = (1 to 4).map(_ => ("g", 250L))
    val mono = Seq(("h", 999L))
    val out = Concentration.hhiByGroup((eqs ++ mono).toDF("g", "cents"), "grp")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g")._3 == 0.25)
    assert(out("g")._4 == 0.25)
    assert(out("g")._5 == 4.0)
    assert(out("h")._3 == 1.0)
  }

  test("triangleCensus: K4 has 4 triangles and transitivity 1; path has 0") {
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val out = graft.ext.Graph.triangleCensus(
      (k4 ++ path).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long, Double)].collect().head
    // K4: 4 triangles, 12 wedges; path: 2 wedges, 0 triangles
    assert(out._1 == 8L) // nodes
    assert(out._2 == 9L) // edges
    assert(out._3 == 14L) // wedges
    assert(out._4 == 4L) // triangles
    assert(out._5 == math.rint(3.0 * 4 / 14 * 1e6) / 1e6)
  }

  test("triangleCensus: hub star with one closing edge counts once") {
    // star center 1 with leaves 2..6, plus edge (2,3): exactly 1 triangle
    val star = (2 to 6).map(l => (1L, l.toLong)) :+ (2L, 3L)
    val out = graft.ext.Graph.triangleCensus(
      star.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(out._4 == 1L)
  }
}
