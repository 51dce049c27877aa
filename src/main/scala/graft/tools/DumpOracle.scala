package graft.tools

import graft.SparkEntry

/** Print the registered DuckDB oracle SQL for the named queries — lets
  * scripts/check_oracle-style spot checks run one oracle without a full
  * Verify pass. Usage: runMain graft.tools.DumpOracle <query> [<query>...]
  */
object DumpOracle {
  def main(args: Array[String]): Unit =
    args.foreach { n =>
      println(s"-- ===== $n")
      println(SparkEntry.oracleSql.getOrElse(n, s"-- no oracle for $n"))
    }
}
