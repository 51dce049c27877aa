package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — Spark startup
  * dominates test time otherwise).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = GraftSession.quiet(GraftSession.local("graft-test", cores = "4"))
    // r6 VERDICT #5: every pinned plan in the suite runs under Spark's own
    // plan-integrity validation (schema/exprId invariants re-checked after
    // every optimizer rule) — SplitDistinctAggregatesSpec proved the
    // harness tolerates it; now it guards the whole engine's rules.
    s.conf.set("spark.sql.planChangeValidation", "true")
    s
  }

  def golden(name: String): String =
    s"src/test/resources/golden/$name"

  def sfDir(sf: String = "0.001"): String = s"/root/testdata/sf$sf"
}

object Compare {

  /** Assert same rows (unordered), with numeric tolerance. Sorts both sides
    * by a stable string render, then compares cell-wise.
    */
  def assertSameData(
      actual: DataFrame,
      expected: DataFrame,
      tol: Double = 1e-9,
      sortCols: Seq[String] = Nil
  ): Unit = {
    val aCols = actual.columns.toSeq
    val eCols = expected.columns.toSeq
    assert(aCols == eCols, s"column mismatch: $aCols vs $eCols")
    val key: Row => String = r =>
      (0 until r.length).map { i =>
        normalize(r.get(i)) match {
          case d: java.lang.Double => f"${d.doubleValue()}%.6e"
          case x => String.valueOf(x)
        }
      }.mkString("|")
    val sortedA = collectSorted(actual, sortCols, key)
    val sortedE = collectSorted(expected, sortCols, key)
    assert(sortedA.length == sortedE.length,
      s"row count mismatch: ${sortedA.length} vs ${sortedE.length}")
    sortedA.zip(sortedE).zipWithIndex.foreach { case ((a, e), idx) =>
      (0 until a.length).foreach { i =>
        val (av, ev) = (normalize(a.get(i)), normalize(e.get(i)))
        (av, ev) match {
          case (x: java.lang.Double, y: java.lang.Double) =>
            val (xd, yd) = (x.doubleValue(), y.doubleValue())
            assert(
              (xd.isNaN && yd.isNaN) ||
                math.abs(xd - yd) <= tol * math.max(1.0, math.abs(yd)),
              s"row $idx col ${aCols(i)}: $xd vs $yd")
          case _ =>
            assert(String.valueOf(av) == String.valueOf(ev),
              s"row $idx col ${aCols(i)}: $av vs $ev")
        }
      }
    }
  }

  /** Canonicalize cell values so LTZ/NTZ timestamps, floats, decimals and
    * dates all compare by value. Session + JVM timezone are pinned to UTC.
    */
  private def normalize(v: Any): Any = v match {
    case ts: java.sql.Timestamp => ts.toLocalDateTime
    case d: java.sql.Date => d.toLocalDate
    case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue())
    case b: java.math.BigDecimal => java.lang.Double.valueOf(b.doubleValue())
    case x => x
  }

  private def collectSorted(
      df: DataFrame, sortCols: Seq[String], key: Row => String): Array[Row] = {
    val rows = df.collect()
    if (sortCols.nonEmpty) {
      val idxs = sortCols.map(c => df.columns.indexOf(c))
      rows.sortBy(r => idxs.map(i => String.valueOf(r.get(i))).mkString("|") + key(r))
    } else rows.sortBy(key)
  }
}
