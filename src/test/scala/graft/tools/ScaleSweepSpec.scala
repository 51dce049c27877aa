package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The 100×-sweep coverage contract (VERDICT r8 #6): every registered
  * query either appears in a sweep set (at100 / at10) or carries a named
  * reason in the exclusion ledger — a new query with neither fails here,
  * so coverage gaps can never be silent.
  */
class ScaleSweepSpec extends AnyFunSuite {

  test("every registry query is swept at scale or carries a named " +
    "exclusion reason; ledger has no stale names or overlaps") {
    val all = graft.SparkEntry.all.map(_.name).toSet
    val swept = (ScaleSweep.at100 ++ ScaleSweep.at10).toSet
    val sweptRegistry = swept.filter(all)
    val annotated = ScaleSweep.excludedReasons.keySet

    val unaccounted = all -- sweptRegistry -- annotated
    assert(unaccounted.isEmpty,
      s"queries with no 100x measurement and no recorded reason: " +
        s"${unaccounted.toSeq.sorted.mkString(", ")}")

    val stale = annotated -- all
    assert(stale.isEmpty,
      s"exclusion ledger names unknown queries: " +
        s"${stale.toSeq.sorted.mkString(", ")}")

    val overlap = annotated.intersect(sweptRegistry)
    assert(overlap.isEmpty,
      s"both swept and excluded: ${overlap.toSeq.sorted.mkString(", ")}")

    // non-registry sweep names must be real ScaleCheck extras (x-channels)
    val unknownSwept = swept -- all -- ScaleCheck.extras.keySet
    assert(unknownSwept.isEmpty,
      s"swept names not in registry or extras: " +
        s"${unknownSwept.toSeq.sorted.mkString(", ")}")

    // no duplicate annotations across ledger groups
    val flat = ScaleSweep.exclusionLedger.flatMap(_._2)
    assert(flat.distinct.size == flat.size,
      s"duplicated ledger entries: " +
        s"${flat.diff(flat.distinct).distinct.mkString(", ")}")
  }
}
