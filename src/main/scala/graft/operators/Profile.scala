package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Contract: `vmin`/`vmax` are reported as DOUBLE — the profile is a
  * numeric-measure audit; a non-numeric column profiles nulls/distinct
  * correctly but its min/max cast to null.
  */
object Profile {

  /** Reference a column by its LITERAL name whatever characters it
    * contains: backtick-quoted with embedded backticks doubled, so
    * dots, spaces, hyphens or quotes never mis-parse as field access
    * or break an interpolated identifier. */
  private def byName(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val distinctOf = (c: Column) =>
      if (exact) countDistinct(c) else approx_count_distinct(c)
    // generated collision-proof aliases (_p0_nulls, …): the user column
    // name appears only as a string LITERAL in the output, never as an
    // identifier that gets re-parsed
    val aggExprs = count(lit(1)).as("n_rows") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(when(byName(c).isNull, 1L).otherwise(0L)).as(s"_p${i}_nulls"),
        distinctOf(byName(c)).as(s"_p${i}_distinct"),
        min(byName(c)).cast("double").as(s"_p${i}_min"),
        max(byName(c)).cast("double").as(s"_p${i}_max"))
      }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val long = array(cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"_p${i}_nulls").as("n_nulls"),
        col(s"_p${i}_distinct").as("n_distinct"),
        col(s"_p${i}_min").as("vmin"),
        col(s"_p${i}_max").as("vmax"))
    }: _*)
    one.select(col("n_rows"), explode(long).as("s"))
      .select(col("s.col_name").as("col_name"), col("n_rows"),
        col("s.n_nulls").as("n_nulls"), col("s.n_distinct").as("n_distinct"),
        col("s.vmin").as("vmin"), col("s.vmax").as("vmax"))
      .orderBy("col_name")
  }
}
