package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles per group, rank-selection style.
  *
  * Spark's built-in `percentile` aggregate buffers a value→count
  * OpenHashMap per group inside the aggregation buffer: every partial
  * ships a map of all distinct values through the shuffle and the
  * final merge concentrates the whole group's value set on one
  * reducer — memory O(distinct values per group) on a single task,
  * which is exactly what dies first on a 100 TB fact table with few
  * groups.
  *
  * This operator computes the same number (linear interpolation at
  * rank p·(n-1), the reference semantics of `percentile` /
  * DuckDB `quantile_cont`) from a value histogram instead:
  *
  *   1. `groupBy(group, value).count()` — map-side combinable, the
  *      only corpus-sized shuffle, carrying (group, value, cnt) rows.
  *   2. per-group cumulative counts over the (much smaller) histogram
  *      via a window ordered by value.
  *   3. the value at rank r is the first histogram row with cum ≥ r —
  *      a `min(value) FILTER (cum ≥ r)` aggregate, one row per group.
  *
  * The residual window sorts only distinct values per group; for a
  * genuinely continuous column that is still the group's value set,
  * but as (value, cnt) pairs in a sort — no hashmap merge, spillable,
  * and the heavy counting already happened map-side. (For
  * pathological all-unique columns at extreme scale, quantize values
  * first or accept `percentile_approx`.)
  */
object Percentiles {

  /** One row per group: for each `(name, p)` in `ps`, a column `name`
    * holding the exact p-percentile of `valueCol` (nulls ignored,
    * like the built-in aggregate). */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            ps: Seq[(String, Double)]): DataFrame = {
    val hist = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val byVal = Window.partitionBy(groupCol).orderBy("v")
    val all = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum("cnt").over(byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(all))
    val aggs: Seq[Column] = ps.flatMap { case (name, p) =>
      // 1-based rank position of the p-percentile: pos = p*(n-1)+1;
      // interpolate between the values at floor(pos) and ceil(pos)
      val pos = lit(p) * (col("n") - 1) + 1
      val lo = floor(pos)
      val hi = ceil(pos)
      val vLo = min(when(col("cum") >= lo, col("v")))
      val vHi = min(when(col("cum") >= hi, col("v")))
      val frac = max(pos - lo) // group-constant
      Seq((vLo + frac * (vHi - vLo)).as(name))
    }
    cum.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }
}
