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

  /** Approximate audience OVERLAP between two cohorts by
    * inclusion–exclusion over HLL sketches: |A∩B| ≈ |A| + |B| − |A∪B|,
    * where all three cardinalities come from the SAME two sketches
    * (the union is a sketch merge, not a data pass). This is the
    * segment-overlap / cross-campaign-reach estimator: exact distinct
    * intersection needs both cohorts' full id sets on one shuffle;
    * the sketch form ships KB per cohort and answers any pairwise
    * overlap after the fact.
    *
    * One aggregate per cohort (map-side combinable), one driver-sized
    * combine. Intersection error compounds: it is the DIFFERENCE of
    * ~1.6% estimates, so small true overlaps disappear into noise —
    * the spec pins behavior on planted 50% and 0% overlaps where the
    * signal dominates. Returns one row: est_a, est_b, est_union,
    * est_intersection (clamped at 0). */
  def hllOverlap(a: DataFrame, b: DataFrame, valueCol: String,
                 lgK: Int = 12): DataFrame = {
    val sa = a.agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
      .withColumn("_side", lit("a"))
    val sb = b.agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
      .withColumn("_side", lit("b"))
    sa.unionByName(sb)
      .agg(
        max(when(col("_side") === "a",
          hll_sketch_estimate(col("hll")))).as("est_a"),
        max(when(col("_side") === "b",
          hll_sketch_estimate(col("hll")))).as("est_b"),
        hll_sketch_estimate(hll_union_agg(col("hll"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0L),
          col("est_a") + col("est_b") - col("est_union"))
          .as("est_intersection"))
  }
}
