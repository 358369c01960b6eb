package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE/data-quality pass a lake runs after
  * every load: per-column null counts, distinct cardinality, min/max,
  * all in ONE scan (one aggregate node; every statistic partial-
  * aggregates). Output is long format, one row per profiled column, so
  * downstream checks (null-rate alerts, cardinality drift) are plain
  * filters.
  *
  * `exact = true` uses COUNT(DISTINCT) — Catalyst plans the multi-
  * distinct aggregate via Expand (input replicated ×|cols|), the right
  * trade for audit-grade numbers and what the DuckDB oracle can check.
  * At 100 TB-scale profiling set `exact = false`: HLL sketches
  * (approx_count_distinct) keep the plan a plain two-phase aggregate
  * with constant memory per column and no Expand.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val distinctOf = (c: String) =>
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggExprs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      distinctOf(c).as(s"${c}__distinct"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max")))
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    one.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, vmin, vmax)"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "vmin", "vmax")
      .orderBy("col_name")
  }
}
