package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.{Bootstrap, FactorAnalysisEM, MonteCarlo, Summary}
import graft.queries.Q._

/** The reference's gold-layer statistical operators (SURVEY.md §2.8), run on
  * the driver testdata. Stochastic (seeded Spark RNG) or EM-iterative →
  * no SQL oracle; the driver records rows-only checks and ScalaTest holds
  * the tolerance/structure assertions.
  */
object StatQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---- F1: Monte Carlo scenario simulation (traffic col := o_totalprice)
    QueryDef(
      "q40_monte_carlo_scenarios",
      (s, dir) =>
        MonteCarlo.simulate(s, t(s, dir, "orders"),
          trafficCol = Some("o_totalprice")),
      None
    ),

    // ---- F1 hardened: the deterministic half of the Monte Carlo contract
    //      (closed-form E[sim] = base·mult, threshold, n_sims) — DECIMAL-
    //      routed base mean so the DuckDB oracle hash-matches exactly
    QueryDef(
      "q65_monte_carlo_expectations",
      (s, dir) =>
        MonteCarlo.scenarioExpectations(s, t(s, dir, "orders"),
          trafficCol = Some("o_totalprice")),
      Some {
        val values = MonteCarlo.scenarios.zipWithIndex.map { case (sc, i) =>
          s"($i, '${sc.scenario}', '${sc.description}', " +
            s"CAST(${sc.scenarioMult} AS DOUBLE)*CAST(${sc.trafficMult} AS DOUBLE))"
        }.mkString(",\n")
        s"""WITH s AS (SELECT ${sqlSumExact("o_totalprice", 6)}/count(o_totalprice) AS base,
           |quantile_cont(o_totalprice, 0.75) AS thr FROM orders),
           |d(ord, scenario, description, mult) AS (VALUES
           |$values)
           |SELECT scenario, description,
           |round(base*mult, 2) AS expected_mean_traffic,
           |round(thr, 2) AS threshold_used,
           |CAST(10000 AS BIGINT) AS n_simulations
           |FROM d, s ORDER BY ord""".stripMargin
      }
    ),

    // ---- F3 hardened: unit-weight bootstrap — every replicate mean IS the
    //      column mean, flowing through the real statsRow/percentile path;
    //      fully deterministic, so oracled (the stochastic q41 rides on the
    //      same machinery)
    QueryDef(
      "q66_bootstrap_unit_weight",
      (s, dir) =>
        Bootstrap.fixedWeight(s, t(s, dir, "lineitem")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          nSim = 1000),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        // lineitem numerics are null-free in the fixture, so no median-fill
        // term is needed in the oracle's mean
        cols.map { c =>
          val m = s"round(${sqlSumExact(c, 6)}/count($c), 4)"
          s"SELECT '$c' AS index, $m AS mean_estimate, 0.0 AS std_estimate, " +
            s"$m AS ci_lower_95, $m AS ci_upper_95, 1000.0 AS simulations " +
            "FROM lineitem"
        }.mkString(" UNION ALL ")
      }
    ),

    // ---- F3: bootstrap CIs over lineitem numerics
    QueryDef(
      "q41_bootstrap_ci",
      (s, dir) =>
        Bootstrap(s, t(s, dir, "lineitem")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          nSim = 1000),
      None
    ),

    // ---- F2: factor loadings over lineitem numeric structure
    QueryDef(
      "q42_factor_loadings",
      (s, dir) => {
        val df = t(s, dir, "lineitem")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val model = FactorAnalysisEM.fit(df, nComponents = 2)
        FactorAnalysisEM.loadingsDF(s, model)
      },
      None
    ),

    // ---- the DISTRIBUTED half of F2, oracled: factor analysis = one pass
    //      of sufficient statistics (n, mean, MLE covariance) + driver-side
    //      EM on the tiny d×d matrix. q42's loadings can't have a DuckDB
    //      twin (EM isn't SQL), but the moments — the part that actually
    //      touches 100 TB — hash-match covar_pop exactly. Small-range
    //      columns keep the naive-vs-stable summation difference far below
    //      the rounding grain.
    QueryDef(
      "q71_fa_moments",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_discount", "l_tax")
        val df = t(s, dir, "lineitem").select(cols.map(col): _*)
        val (prepared, kept, _) = FactorAnalysisEM.prepare(df)
        val (n, mean, cov) = FactorAnalysisEM.momentStats(prepared, kept)
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        import s.implicits._
        kept.zipWithIndex.map { case (c, i) =>
          (c, n, r6(mean(i)), r6(cov(i, 0)), r6(cov(i, 1)), r6(cov(i, 2)))
        }.toDF("index", "n", "mean_val", kept(0), kept(1), kept(2))
          .orderBy("index")
      },
      Some {
        val cols = Seq("l_quantity", "l_discount", "l_tax")
        cols.map { r =>
          s"SELECT '$r' AS index, count(*) AS n, " +
            s"round(avg($r), 6) AS mean_val, " +
            cols.map(c => s"round(covar_pop($r, $c), 6) AS $c").mkString(", ") +
            " FROM lineitem"
        }.mkString("", " UNION ALL ", " ORDER BY index")
      }
    ),

    // ---- A11: one-pass describe (count/mean/std/min/quartiles/max per col)
    QueryDef(
      "q43_describe",
      (s, dir) =>
        Summary.describeNumeric(s,
          t(s, dir, "lineitem").select("l_quantity", "l_extendedprice"))
          .withColumn("mean", round(col("mean"), 4))
          .withColumn("std", round(col("std"), 4))
          .withColumn("p25", round(col("p25"), 4))
          .withColumn("p50", round(col("p50"), 4))
          .withColumn("p75", round(col("p75"), 4))
          .orderBy("index"),
      Some("""SELECT 'l_extendedprice' AS index,
             |CAST(count(l_extendedprice) AS DOUBLE) AS count,
             |round(avg(l_extendedprice), 4) AS mean,
             |round(stddev_samp(l_extendedprice), 4) AS std,
             |min(l_extendedprice) AS min,
             |round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             |max(l_extendedprice) AS max
             |FROM lineitem
             |UNION ALL SELECT 'l_quantity',
             |CAST(count(l_quantity) AS DOUBLE),
             |round(avg(l_quantity), 4), round(stddev_samp(l_quantity), 4),
             |min(l_quantity), round(quantile_cont(l_quantity, 0.25), 4),
             |round(quantile_cont(l_quantity, 0.5), 4),
             |round(quantile_cont(l_quantity, 0.75), 4), max(l_quantity)
             |FROM lineitem
             |ORDER BY index""".stripMargin)
    ),

    // ---- A12: full correlation matrix (one ML pass), keyed by `index`
    QueryDef(
      "q44_corr_matrix",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val m = Summary.corrMatrix(s, t(s, dir, "lineitem").select(cols.map(col): _*))
        cols.foldLeft(m)((d, c) => d.withColumn(c, round(col(c), 4)))
          .orderBy("index")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map { r =>
          s"SELECT '$r' AS index, " + cols.map(c =>
            s"round(corr($r, $c), 4) AS $c").mkString(", ") + " FROM lineitem"
        }.mkString("", " UNION ALL ", " ORDER BY index")
      }
    )
  )
}
