package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object PlanHints {

  /** Keep an expensive post-join filter OUT of the join condition.
    *
    * Catalyst pushes deterministic filters into join conditions, where (a)
    * common-subexpression elimination doesn't apply — an `array_intersect`
    * referenced twice evaluates twice per candidate pair — and (b) the
    * predicate runs before cheaper conjuncts like `id_a < id_b` can prune.
    * OR-ing an always-false NON-deterministic term marks the predicate
    * unpushable, so it stays a post-join Filter over a projected column:
    * one evaluation per surviving row, after the cheap join pruning.
    */
  def noPushdown(pred: Column): Column =
    pred || isnan(rand(7)) // rand() is never NaN → semantically `pred`
}
