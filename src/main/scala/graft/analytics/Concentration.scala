package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Concentration / inequality indices over a keyed measure — the market-
  * structure readouts (who dominates a segment, how unequal is spend)
  * that sit next to the revenue rollups in the reference's gold layer
  * (`Analysis.ipynb` cell 9's per-segment revenue shares, generalized).
  *
  * Both indices are exact-rational until ONE final division: the measure
  * is summed in DECIMAL, converted to integer cents, and every
  * intermediate (rank-weighted sum, sum of squares) stays in integer /
  * DECIMAL space — so the DuckDB twins land on bit-identical doubles.
  */
object Concentration {

  private def d(c: Column): Column = c.cast("double")

  /** Per-group Gini coefficient of a per-entity measure, via the
    * rank-weighted closed form over ascending-sorted values:
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx).
    *
    * The measure aggregates to one row per entity (single keyed shuffle),
    * ranks come from one sort-based window per group (ties broken by
    * entity id — any total order of equal values yields the same G), and
    * the rank-weighted sum routes through DECIMAL(38,0) so no engine's
    * int64 overflow semantics are in play. Zero-total groups return null.
    */
  def giniByGroup(
      perEntity: DataFrame, // columns: g (group), e (entity id), cents (long)
      outGroupCol: String
  ): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("cents"), col("e"))
    val ranked = perEntity.withColumn("i", row_number().over(w).cast(LongType))
    ranked
      .groupBy("g")
      .agg(
        count(lit(1)).cast(LongType).as("n"),
        sum(col("cents").cast(DecimalType(28, 0))).as("s"),
        sum((col("i") * col("cents")).cast(DecimalType(28, 0))).as("s1")
      )
      .select(
        col("g").as(outGroupCol),
        col("n").as("n_entities"),
        round(
          (lit(2.0) * d(col("s1")) - d(col("n") + 1) * d(col("s"))) /
            (d(col("n")) * d(col("s"))),
          6
        ).as("gini")
      )
      .orderBy(outGroupCol)
  }

  /** Per-group Herfindahl-Hirschman index of a per-entity measure:
    * HHI = Σ sᵢ² / (Σ sᵢ)², plus the top single-entity share and the
    * effective number of competitors 1/HHI.
    *
    * Squares stay exact: cents at DECIMAL(18,0) square to DECIMAL(37,0)
    * and sum inside width 38 in both engines (the CLAUDE.md width
    * discipline); the two casts to double are correctly rounded from
    * exact decimals, so the final divisions agree bit-for-bit.
    */
  def hhiByGroup(
      perEntity: DataFrame, // columns: g (group), cents (long)
      outGroupCol: String
  ): DataFrame = {
    val c18 = col("cents").cast(DecimalType(18, 0))
    perEntity
      .groupBy("g")
      .agg(
        count(lit(1)).cast(LongType).as("n"),
        sum(c18).as("s"),
        sum((c18 * c18).cast(DecimalType(37, 0))).as("s2"),
        max(col("cents")).as("mx")
      )
      .select(
        col("g").as(outGroupCol),
        col("n").as("n_entities"),
        round(d(col("s2")) / (d(col("s")) * d(col("s"))), 6).as("hhi"),
        round(d(col("mx")) / d(col("s")), 6).as("top_share"),
        round((d(col("s")) * d(col("s"))) / d(col("s2")), 4).as("effective_n")
      )
      .orderBy(outGroupCol)
  }
}
