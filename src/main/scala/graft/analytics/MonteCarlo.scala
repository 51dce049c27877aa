package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Cleaning

/** Gold stage: Monte Carlo weather-scenario simulation.
  * Mirrors python-service/scripts/monte_carlo.py:116-230.
  *
  * All four scenarios run in ONE Spark plan: a broadcast cross-join of
  * `spark.range(nSim)` against the 4-row scenario dimension table, with
  * `randn(seed)` supplying the per-(draw, scenario) normal variates. No
  * driver-side loop, no UDF — pure codegen'd expressions, so the same plan
  * scales to billions of draws.
  *
  * Quirk preserved for parity (SURVEY.md §7.4#3): the "traffic" column falls
  * back to the FIRST numeric column (`traffic_id` on the merged table,
  * monte_carlo.py:192-195), and the scenario multiplier COMPOUNDS with the
  * config multiplier (monte_carlo.py:199-206). Override via `trafficCol`.
  */
object MonteCarlo {

  /** Scenario config table (monte_carlo.py:133-154) + hard-coded
    * scenario_multipliers (monte_carlo.py:199-204).
    */
  final case class Scenario(
      scenario: String,
      description: String,
      trafficMult: Double,
      accidentFactor: Double,
      scenarioMult: Double
  )

  val scenarios: Seq[Scenario] = Seq(
    Scenario("sunny", "Clear weather, normal conditions", 1.1, 0.7, 1.05),
    Scenario("rainy", "Heavy rain, reduced visibility", 0.9, 1.6, 0.85),
    Scenario("foggy", "Dense fog, low visibility", 0.8, 2.1, 0.75),
    Scenario("snowy", "Snow/ice conditions, severe impact", 0.7, 2.8, 0.65)
  )

  val BaseAccidentRate = 0.025 // monte_carlo.py:217
  val VolatilityFactor = 0.18 // monte_carlo.py:210

  /** traffic_volume | volume | first numeric column (monte_carlo.py:192-195). */
  def trafficColumn(df: DataFrame): String =
    Seq("traffic_volume", "volume")
      .find(df.columns.contains)
      .getOrElse(Cleaning.numericCols(df).head)

  /** Deterministic twin of `simulate`: the closed-form per-scenario
    * expectation E[sim] = base·mult plus the non-stochastic output columns
    * (threshold_used, n_simulations), with the base mean DECIMAL-routed so
    * a SQL oracle in another engine reproduces it bit-for-bit. This is the
    * hash-checkable half of the Monte Carlo contract; the sampled half is
    * pinned by tolerance tests against these same expectations.
    */
  def scenarioExpectations(
      spark: SparkSession,
      df: DataFrame,
      nSimulations: Int = 10000,
      trafficCol: Option[String] = None
  ): DataFrame = {
    import graft.queries.Q
    val tc = trafficCol.getOrElse(trafficColumn(df))
    val stats = df.agg(
      (Q.sumExact(col(tc), 6) / count(col(tc))).as("base"),
      percentile(col(tc), lit(0.75)).as("thr"))
    import spark.implicits._
    val dim = scenarios.zipWithIndex
      .map { case (s, i) =>
        (i, s.scenario, s.description, s.scenarioMult * s.trafficMult)
      }
      .toDF("ord", "scenario", "description", "mult")
    dim
      .crossJoin(broadcast(stats))
      .select(col("ord"), col("scenario"), col("description"),
        round(col("base") * col("mult"), 2).as("expected_mean_traffic"),
        round(col("thr"), 2).as("threshold_used"),
        lit(nSimulations.toLong).as("n_simulations"))
      .orderBy("ord")
      .drop("ord")
  }

  /** PORTABLE-RNG Monte Carlo: the same simulation STRUCTURE as
    * [[simulate]] (per-(draw, scenario) variates, scenario dim cross-join,
    * one distributed plan) with every random draw replaced by a
    * deterministic engine-portable stream, so the SIMULATION ITSELF — not
    * just its expectation ([[scenarioExpectations]]) — hash-matches a
    * DuckDB twin (q40's registered oracle since r6; q215 in r5):
    *
    *  - uniforms: the portable md5 hash (q68-q73 family) of
    *    "mc|ord|draw|j" keys, u = (h+1)/2^60 — exact dyadics both engines;
    *  - normals: Irwin–Hall(12) (Σ₁²¹ u − 6: variance exactly 1, mean 0) —
    *    a fixed left-associated chain of 12 uniform adds, the identical
    *    IEEE sequence in both engines, ZERO libm calls;
    *  - draws quantized to integer centi-units (floor(sim·100)): per-
    *    scenario sums are exact longs / width-37 decimals, so mean and
    *    population std are ORDER-INDEPENDENT — partitioning can never
    *    change the answer — and the final readouts are fixed-shape IEEE
    *    doubles (raw, unrounded: engines agree bit-for-bit, the
    *    q147/q148 pattern);
    *  - the congestion threshold compares as an integer (centi-units of
    *    the 2dp-rounded 75th percentile) so no float boundary can flip.
    *
    * Production keeps [[simulate]]'s `randn` (better tail behavior, native
    * codegen); this variant is the oracle-checkable twin of the whole
    * sampled path.
    */
  def simulatePortable(
      spark: SparkSession,
      df: DataFrame,
      nSimulations: Int = 10000,
      trafficCol: Option[String] = None
  ): DataFrame = {
    import graft.queries.Q
    import org.apache.spark.sql.Column
    val tc = trafficCol.getOrElse(trafficColumn(df))
    // base mean as DOUBLE division of an EXACT decimal sum by an exact
    // count — the decimal-division scale rules differ between engines,
    // but casting identical exact operands and dividing in IEEE doubles
    // is bit-identical everywhere
    val stats = df.agg(
      Q.sumExact(col(tc), 6).as("_S"),
      count(col(tc)).as("_n"),
      percentile(col(tc), lit(0.75)).as("thr"))
    import spark.implicits._
    val dim = scenarios.zipWithIndex
      .map { case (s, i) =>
        (i, s.scenario, s.description, s.scenarioMult * s.trafficMult,
          s.accidentFactor)
      }
      .toDF("ord", "scenario", "description", "mult", "accident_factor")
    val two60 = lit(1152921504606846976L).cast("double")
    def u(j: Int): Column =
      (graft.ext.Dedup.portableHash60(
        concat(lit("mc|"), col("ord").cast("string"), lit("|"),
          col("id").cast("string"), lit("|"), lit(j.toString)))
        + lit(1L)).cast("double") / two60
    val ih = (1 to 12).map(u).reduce(_ + _) - lit(6.0)
    val baseD = col("_S").cast("double") / col("_n").cast("double")
    val sim = ih * (lit(VolatilityFactor) * baseD) + baseD * col("mult")
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val sims = spark.range(nSimulations.toLong)
      .crossJoin(broadcast(dim))
      .crossJoin(broadcast(stats))
      .select(col("ord"), col("scenario"), col("description"),
        floor(sim * lit(100.0)).cast("long").as("simc"),
        (u(0) < lit(BaseAccidentRate) * col("accident_factor")).as("acc"),
        floor(round(col("thr"), 2) * lit(100.0)).cast("long").as("thrc"),
        round(col("thr"), 2).as("thr2"))
    val nD = lit(nSimulations.toDouble)
    val meanC = col("_s1").cast("double") / nD
    sims
      .groupBy("ord", "scenario", "description")
      .agg(sum(col("simc")).as("_s1"),
        sum(col("simc").cast(dec18) * col("simc").cast(dec18)).as("_s2"),
        sum(when(col("simc") > col("thrc"), 1L).otherwise(0L)).as("_nc"),
        sum(when(col("acc"), 1L).otherwise(0L)).as("_na"),
        max(col("thr2")).as("threshold_used"))
      .select(col("ord"), col("scenario"), col("description"),
        (meanC / lit(100.0)).as("mean_traffic"),
        (sqrt(col("_s2").cast("double") / nD - meanC * meanC) / lit(100.0))
          .as("traffic_std"),
        (col("_nc").cast("double") * lit(100.0) / nD)
          .as("congestion_prob_high"),
        (col("_na").cast("double") * lit(100.0) / nD)
          .as("accident_risk_high"),
        col("threshold_used"),
        lit(nSimulations.toLong).as("n_simulations"))
      .orderBy("ord")
      .drop("ord")
  }

  /** 4-row result: scenario, description, mean_traffic, traffic_std,
    * congestion_prob_high, accident_risk_high, threshold_used, n_simulations.
    */
  def simulate(
      spark: SparkSession,
      df: DataFrame,
      nSimulations: Int = 10000,
      seed: Long = 42L,
      trafficCol: Option[String] = None
  ): DataFrame = {
    val tc = trafficCol.getOrElse(trafficColumn(df))
    // base stats in one pass (mean + 75th percentile of the non-null values)
    val row = df
      .agg(avg(col(tc)).as("base"), percentile(col(tc), lit(0.75)).as("thr"))
      .head()
    val base = row.getDouble(0)
    val threshold = row.getDouble(1)

    import spark.implicits._
    val dim = scenarios.zipWithIndex
      .map { case (s, i) =>
        (i, s.scenario, s.description, s.scenarioMult * s.trafficMult,
          s.accidentFactor)
      }
      .toDF("ord", "scenario", "description", "mult", "accident_factor")

    val sims = spark
      .range(nSimulations.toLong)
      .crossJoin(broadcast(dim))
      .withColumn("sim",
        randn(seed) * lit(VolatilityFactor * base) + lit(base) * col("mult"))
      .withColumn("acc",
        (rand(seed + 1) < lit(BaseAccidentRate) * col("accident_factor"))
          .cast("double"))

    sims
      .groupBy("ord", "scenario", "description")
      .agg(
        round(avg(col("sim")), 2).as("mean_traffic"),
        // np.std is population std (ddof=0), monte_carlo.py:225
        round(stddev_pop(col("sim")), 2).as("traffic_std"),
        round(avg((col("sim") > lit(threshold)).cast("double")) * 100, 2)
          .as("congestion_prob_high"),
        round(avg(col("acc")) * 100, 2).as("accident_risk_high")
      )
      .withColumn("threshold_used", round(lit(threshold), 2))
      .withColumn("n_simulations", lit(nSimulations.toLong))
      .orderBy("ord")
      .drop("ord")
  }
}
