package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** User-behavior sequence analytics — the journey/cohort/survival readouts
  * a product-analytics pipeline derives from an event stream (ref: the
  * notebook's per-day event rollups, `Analysis.ipynb` cell 11, generalized
  * to the sequence operators a warehouse team ships next).
  *
  * All three operators collapse the event stream to a per-user or
  * per-transition grain in ONE keyed shuffle before any window or join
  * touches it, so wall-clock tracks scan time at lake scale. Outputs are
  * exactly DuckDB-oracle-able: counts stay integers, probabilities are one
  * final division, and the Kaplan-Meier fold multiplies doubles in an
  * explicit sorted order both engines replay identically.
  */
object Behavior {

  private def d(c: Column): Column = c.cast("double")

  /** First-order Markov transition matrix over per-user event sequences:
    * `lead` within (user, ts, id) order pairs each event with its
    * successor, one groupBy counts transitions, and the row-normalized
    * probability is a single integer division. The matrix is
    * |event types|² — driver-tiny however large the stream.
    *
    * Ordering ties on equal timestamps break by event id, so the sequence
    * (and the oracle's) is total and deterministic.
    */
  def markovTransitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String
  ): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
    val cnt = pairs
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    val tot = cnt
      .groupBy("from_type")
      .agg(sum(col("n")).cast(LongType).as("n_from"))
    cnt
      .join(broadcast(tot), "from_type")
      .select(
        col("from_type"),
        col("to_type"),
        col("n"),
        round(d(col("n")) / d(col("n_from")), 6).as("prob")
      )
      .orderBy("from_type", "to_type")
  }

  /** Weekly cohort retention matrix: users grouped by their first active
    * week (epoch-week = epoch-day div 7 — integer floor division, no
    * engine week-of-year semantics involved), then the share of each
    * cohort active k weeks later.
    *
    * ONE shuffle total: `collect_set(week)` per user (set size is bounded
    * by the calendar, not the event count, and combines map-side); cohort
    * and offsets explode from the per-user set, and the matrix is
    * cohorts × offsets — driver-tiny.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String
  ): DataFrame = {
    val day = datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date"))
      .cast(LongType)
    val perUser = events
      .select(col(userCol).as("u"), day.as("dday"))
      .select(col("u"), expr("dday div 7").as("wk"))
      .groupBy("u")
      .agg(min(col("wk")).as("cw"), collect_set(col("wk")).as("wks"))
    val ret = perUser
      .select(col("cw"), explode(col("wks")).as("wk"))
      .groupBy(col("cw").as("cohort_week"), (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).cast(LongType).as("n_active"))
    val size = ret
      .filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    ret
      .join(broadcast(size), "cohort_week")
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_active"),
        col("cohort_size"),
        round(d(col("n_active")) / d(col("cohort_size")), 6).as("retention")
      )
      .orderBy("cohort_week", "week_offset")
  }

  /** Kaplan-Meier survival of user lifetime (days between first and last
    * event), with right-censoring: a user whose last event falls within
    * `censorDays` of the observation end is still-active — censored at
    * lifetime (maxDay − firstDay) rather than counted as churned.
    *
    * The event stream collapses to one row per user (single keyed
    * shuffle), then to one row per distinct lifetime value — the risk
    * table n_t = N − Σ_{s<t}(d_s + c_s) lives on a calendar-bounded tiny
    * frame. S(h) at each requested horizon is the product
    * Π_{t≤h, d_t>0} (1 − d_t/n_t) evaluated as an explicit left fold over
    * the t-sorted term array — each term is one IEEE division of exact
    * integers and the multiplication ORDER is pinned by the sort, so the
    * DuckDB twin (list_reduce over the same ordered list) lands on
    * bit-identical doubles.
    */
  def kaplanMeier(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      censorDays: Int,
      horizons: Seq[Int]
  ): DataFrame = {
    val day = datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date"))
      .cast(LongType)
    val perUser = events
      .select(col(userCol).as("u"), day.as("dday"))
      .groupBy("u")
      .agg(min(col("dday")).as("first"), max(col("dday")).as("last"))
    val maxDay = broadcast(perUser.agg(max(col("last")).as("m")))
    val lifetimes = perUser
      .crossJoin(maxDay)
      .select(
        when(col("last") <= col("m") - censorDays, col("last") - col("first"))
          .as("t_death"),
        when(col("last") > col("m") - censorDays, col("m") - col("first"))
          .as("t_cens")
      )
    val steps = lifetimes
      .select(
        coalesce(col("t_death"), col("t_cens")).as("t"),
        col("t_death").isNotNull.cast("int").as("is_d")
      )
      .groupBy("t")
      .agg(
        sum(col("is_d")).cast(LongType).as("dd"),
        sum(lit(1) - col("is_d")).cast(LongType).as("cc")
      )
    // risk set: everyone whose (death or censor) time is >= t is at risk
    // at t — censored-at-t users count (deaths process first in standard KM)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = steps
      .withColumn("prior", coalesce(sum(col("dd") + col("cc")).over(wCum), lit(0L)))
      .crossJoin(broadcast(steps.agg(sum(col("dd") + col("cc")).cast(LongType).as("nn"))))
      .select(
        col("t"),
        col("dd"),
        (col("nn") - col("prior")).as("n_risk")
      )
      .filter(col("dd") > 0)
    // terms at death times only; fold per horizon over the t-sorted array
    val terms = risk.select(
      col("t"),
      (lit(1.0) - d(col("dd")) / d(col("n_risk"))).as("term")
    )
    val horizonsDf = broadcast(
      terms.sparkSession
        .createDataFrame(horizons.map(h => Tuple1(h.toLong)))
        .toDF("horizon")
    )
    val folded = terms
      .crossJoin(horizonsDf)
      .filter(col("t") <= col("horizon"))
      .groupBy("horizon")
      .agg(
        count(lit(1)).cast(LongType).as("n_steps"),
        sort_array(collect_list(struct(col("t"), col("term")))).as("arr")
      )
      .select(
        col("horizon"),
        col("n_steps"),
        round(
          aggregate(col("arr"), lit(1.0), (acc, x) => acc * x.getField("term")),
          6
        ).as("s_km")
      )
    // horizons before the first death keep S=1 with 0 steps
    horizonsDf
      .join(folded, Seq("horizon"), "left")
      .select(
        col("horizon"),
        coalesce(col("n_steps"), lit(0L)).as("n_steps"),
        coalesce(col("s_km"), lit(1.0)).as("s_km")
      )
      .orderBy("horizon")
  }

  /** Top-N event-type trigrams across user journeys (sequence-pattern
    * mining at the cheapest useful grain): two leads in the same
    * (user, ts, id) window, one count aggregate on a |types|³-bounded
    * key space, deterministic top-N via (count desc, lexicographic)
    * order — plans as TakeOrderedAndProject, partial top-N map-side,
    * never a global sort.
    */
  def journeyTrigrams(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      topN: Int
  ): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .select(
        col(typeCol).as("t1"),
        lead(col(typeCol), 1).over(w).as("t2"),
        lead(col(typeCol), 2).over(w).as("t3")
      )
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).cast(LongType).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(topN)
  }
}
