package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance for grouped additive
  * aggregates (COUNT/SUM — the self-maintainable class): instead of
  * re-aggregating a 100 TB fact table after every commit, the view
  * updates from the table's CHANGE FEED ([[TxLog.changes]] with
  * `withPreimages = true`):
  *
  *   Δ(group) = Σ +postimage + Σ +insert − Σ preimage − Σ delete
  *
  * — change-feed-sized work, not table-sized. The preimage rows are
  * load-bearing: an update that moves a row BETWEEN groups must
  * subtract from the old group and add to the new, which the
  * new-values-only feed cannot express.
  *
  * Sums accumulate in DECIMAL(28,6) (the [[graft.queries.Det]]
  * rationale — increments must combine associatively and exactly, or
  * the maintained view drifts from the recomputed one a few ulp per
  * commit). Groups whose count reaches zero DROP from the view, so
  * maintained state is always exactly `aggregate(head snapshot)`
  * (spec-pinned over create → merge → delete histories).
  */
object Mv {

  /** The view's full-recompute definition over a snapshot: one row per
    * group, `n_rows` plus `sum_<c>` for every `sumCols` column. */
  def aggregate(snapshot: DataFrame, groupCols: Seq[String],
                sumCols: Seq[String]): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c).cast(DecimalType(28, 6)))
          .cast("double").as(s"sum_$c")): _*)

  /** Apply one change feed to the maintained view. `view` is the
    * current state ([[aggregate]]'s schema); returns the next state.
    * Work is O(|changes| + |touched groups|): the feed aggregates to
    * per-group deltas, joins the view FULL OUTER on the group key
    * (untouched groups pass through unchanged), and zero-count groups
    * drop. */
  def applyDelta(view: DataFrame, changes: DataFrame, groupCols: Seq[String],
                 sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1)
      .when(col("_change_type").isin("delete", "update_preimage"), -1)
      .otherwise(raise_error(concat(
        lit("Mv.applyDelta needs a preimage feed (TxLog.changes with " +
          "withPreimages = true); got _change_type="), col("_change_type"))))
    val delta = changes
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("_dn"),
        sumCols.map(c => sum((col(c) * sign).cast(DecimalType(28, 6)))
          .cast("double").as(s"_ds_$c")): _*)
    view.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col)
        :+ (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n_rows")
        :++ sumCols.map(c =>
          (coalesce(col(s"sum_$c").cast(DecimalType(28, 6)), lit(0)) +
            coalesce(col(s"_ds_$c").cast(DecimalType(28, 6)), lit(0)))
            .cast("double").as(s"sum_$c")): _*)
      .filter(col("n_rows") > 0)
  }
}
