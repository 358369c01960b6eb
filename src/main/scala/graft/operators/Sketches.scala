package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental distinct-count rollups via mergeable HLL sketches — the
  * sketch-slice pattern ([[TextOps.heavyHitterSketches]]'s frequency
  * sibling, here for COUNT DISTINCT): each data slice (a day, an
  * ingest batch, a micro-batch) reduces ONCE to a sketch row per
  * group, and any later question over any slice subset is answered by
  * merging sketch bytes — never by rescanning the slices.
  *
  * Why this is the 100 TB shape: "distinct users last 7/30/90 days"
  * over raw events re-scans the window every time and pays the
  * distinct shuffle at data scale. With sketch slices the daily pass
  * is a map-side-combinable aggregate emitting (slice × group) rows of
  * a few KB each, and every window query aggregates
  * days × groups sketch rows — dashboard-sized input regardless of
  * event volume. Merges are exact over the sketch state (DataSketches
  * HLL union), so combining N slices gives the IDENTICAL estimate the
  * single-pass sketch over their union would give (spec-pinned), with
  * the usual ~1.6%/√2^lgK estimate error vs true distinct.
  */
object Sketches {

  /** One HLL sketch row per (slice, groupCols): the incremental
    * accumulation pass, run once per arriving slice. */
  def hllSlices(df: DataFrame, slice: Column, groupCols: Seq[String],
                valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(slice.as("slice") +: groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Combine-on-read: per-group distinct estimate over WHATEVER slice
    * subset `slices` holds (filter upstream to pick the window). */
  def hllCombine(slices: DataFrame, groupCols: Seq[String]): DataFrame =
    slices.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_distinct"))
}
