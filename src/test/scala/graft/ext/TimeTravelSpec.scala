package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LakeOps time travel: the version-log fold (add/remove → active file
  * set per version) and the census invariants a transaction log promises —
  * compaction rewrites preserve content, removes hide it, uncommitted
  * files are invisible at every version.
  */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    (1, "add", "a"), (1, "add", "b"),
    (2, "add", "c"),
    (3, "remove", "a"), (3, "remove", "b"), (3, "add", "ab"), // compaction
    (4, "remove", "c") // retention delete
  ).toDF("version", "action", "file_id")

  test("activeFilesByVersion: adds accumulate, removes hide, rewrite swaps") {
    val active = LakeOps.activeFilesByVersion(log)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(active == Set(
      (1, "a"), (1, "b"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "ab"), (3, "c"),
      (4, "ab")))
  }

  test("latest-action-wins: remove→re-add resurfaces; same-commit " +
    "rewrite nets to add; empty versions still report") {
    val log2 = Seq(
      (1, "add", "a"),
      (2, "remove", "a"),
      (3, "add", "a"), // re-add after remove: visible again at v3
      (4, "remove", "b"), (4, "add", "b") // same-commit rewrite of b
    ).toDF("version", "action", "file_id")
    val active = LakeOps.activeFilesByVersion(log2)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(active == Set((1, "a"), (3, "a"), (4, "a"), (4, "b")),
      s"got $active")
    // v2 has NO visible files, and file b holds no data rows: the census
    // must still emit every version, zero-filled
    val data = Seq(("a", 1, 10.0)).toDF("file_id", "k", "v")
    val out = LakeOps.timeTravelCensus(data, log2, "file_id", "v")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 10.0),
      (3L, 1L, 1L, 10.0),
      (4L, 2L, 1L, 10.0)))
    // note: v2 (zero FILES) has no member rows at all, so it is absent
    // by definition of "active file set"; a version with files but no
    // ROWS is the zero-filled case the left join covers (b at v4)
  }

  test("timeTravelCensus: compaction preserves rows+value; orphans invisible") {
    // files a={1,2}, b={3}, ab={1,2,3} (the rewrite's copy), c={4},
    // orphan z={99} committed nowhere
    val data = Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0),
      ("ab", 1, 10.0), ("ab", 2, 20.0), ("ab", 3, 30.0),
      ("c", 4, 40.0), ("z", 99, 999.0)
    ).toDF("file_id", "k", "v")
    val out = LakeOps.timeTravelCensus(data, log, "file_id", "v")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 60.0), // a+b
      (2L, 3L, 4L, 100.0), // +c
      (3L, 2L, 4L, 100.0), // compacted: SAME content as v2, fewer files
      (4L, 1L, 3L, 60.0))) // c removed
  }

  test("vacuumPlan: retention pins files visible in ANY retained version, " +
    "re-adds resurface, orphans invisible") {
    val vlog = Seq(
      (1, "add", "fA"), (1, "add", "fB"),
      (2, "remove", "fA"),
      (3, "add", "fA"), // re-add: fA must resurface
      (4, "remove", "fB")
    ).toDF("version", "action", "file_id")
    val data = Seq(
      ("fA", 10.0), ("fA", 10.0), ("fB", 5.0),
      ("fZ", 99.0) // orphan: never committed → absent from the plan
    ).toDF("file_id", "value")
    def plan(retain: Int) =
      LakeOps.vacuumPlan(data, vlog, "file_id", "value", retain)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // retention 1 (v4 only): fA visible (re-added at 3), fB removed → gone
    val r1 = plan(1)
    assert(r1.keySet == Set("fA", "fB"))
    assert(r1("fA") == ((0L, 3L, 2L, 20.0)))
    assert(r1("fB") == ((1L, 4L, 1L, 5.0)))
    // retention 2 (v3, v4): fB is visible at v3 → PINNED despite the v4
    // remove
    assert(plan(2)("fB")._1 == 0L)
  }
}
