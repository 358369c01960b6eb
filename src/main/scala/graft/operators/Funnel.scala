package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-step ordered conversion funnel over an event stream — the
  * product-analytics staple that naive per-type counts get wrong: an
  * event counts toward step i only at-or-after the user's QUALIFIED
  * step i−1 time (a click before the first view is not a funnel
  * click).
  *
  * Construction: chained conditional running-window minimums over one
  * (user, ts, tie) window — `t_i` at a row is the earliest step-i
  * event time seen SO FAR that itself sits at-or-after `t_{i−1}`.
  * The running frame (RANGE UNBOUNDED PRECEDING … CURRENT ROW, the
  * ORDER BY default) is load-bearing: a partition-wide min would let a
  * step-i event "see" a step-(i−1) event that happens AFTER it.
  * Equal timestamps qualify (`>=`), so a step can complete at the same
  * instant as its predecessor; ties order by `tieCol`.
  *
  * Scale shape: ONE shuffle total for any number of steps — every
  * chained window shares the user partitioning, and the per-user +
  * global aggregates reuse it. Output is a single row of cumulative
  * reach counts `n_step1 … n_stepN` (n_step_i = users whose events
  * complete steps 1..i in order).
  */
object Funnel {

  /** `maxGap` (e.g. `"30 minutes"`) adds the conversion-window rule:
    * step i only qualifies when it lands within `maxGap` OF the
    * qualified step i−1 time (the "purchase within 30 minutes of the
    * click" form) — same single shuffle, the window condition just
    * gains an upper bound. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type", tieCol: String = "event_id",
             maxGap: Option[String] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    def inWindow(prev: Column): Column = maxGap match {
      case Some(g) =>
        col(tsCol) >= prev && col(tsCol) <= prev + expr(s"INTERVAL $g")
      case None => col(tsCol) >= prev
    }
    var staged = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      // non-step rows can never contribute to any window min or any
      // aggregate (a user with only non-step events adds zeros), so
      // drop them BEFORE the shuffle — on a 50-type event table a
      // 3-step funnel ships 3 types, not 50
      .filter(col(typeCol).isin(steps: _*))
      .withColumn("_t0",
        min(when(col(typeCol) === steps.head, col(tsCol))).over(w))
    for (i <- 1 until steps.size)
      staged = staged.withColumn(s"_t$i",
        min(when(col(typeCol) === steps(i) && inWindow(col(s"_t${i - 1}")),
          col(tsCol))).over(w))
    val perUser = steps.indices.map(i =>
      max(when(col(s"_t$i").isNotNull, 1).otherwise(0)).as(s"_s$i"))
    val totals = steps.indices.map(i => sum(s"_s$i").as(s"n_step${i + 1}"))
    staged.groupBy(userCol)
      .agg(perUser.head, perUser.tail: _*)
      .agg(totals.head, totals.tail: _*)
  }
}
