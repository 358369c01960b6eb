package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped second-moment statistics (correlation / covariance / stddev)
  * computed from EXACT decimal moment sums.
  *
  * Spark's built-in `corr`/`covar_samp`/`stddev_samp` are the everyday
  * path — numerically stable single-pass merge formulas, fully
  * partial-aggregable. What they are NOT is bit-reproducible across
  * engines or even across partition layouts: their double accumulators
  * combine in partition order, so the same data can yield answers a few
  * ulp apart run to run. For an audit surface (and the DuckDB oracle
  * gate) that difference is a hash mismatch.
  *
  * This operator instead aggregates the five raw moments
  * (Σx, Σy, Σxy, Σx², Σy²) as DECIMAL — inputs with bounded decimal
  * scale make every product and sum EXACT, the partial aggregation is
  * a plain decimal sum (map-side combinable, one shuffle, no extra
  * pass) — and only the final per-group formula runs in doubles. Both
  * engines then evaluate the identical IEEE expression over identical
  * operands, so the result is bit-identical, not "close".
  *
  * Contract: x and y must carry ≤6 decimal digits of true scale (the
  * [[graft.queries.Det]] rationale) and |x|,|y| < 10^12 so the
  * DECIMAL(18,6) cast is exact; group cardinality is the only reduced
  * output, so the shuffle is group-sized.
  */
object Stats {

  /** Per-group n / corr(x,y) / covar_samp(x,y) / stddev_samp(x) /
    * stddev_samp(y), decimal-moment-exact (see object doc). Degenerate
    * groups (n < 2, zero variance) hit the same IEEE division/sqrt on
    * both engines and so still compare identically.
    */
  def corrStats(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast(DecimalType(18, 6))
    val y = col(yCol).cast(DecimalType(18, 6))
    val n = col("_n"); val sx = col("_sx"); val sy = col("_sy")
    val sxy = col("_sxy"); val sxx = col("_sxx"); val syy = col("_syy")
    // the three centered second moments, shared by every output column —
    // spelled once so both engines see one expression shape
    val mxy = n * sxy - sx * sy
    val mxx = n * sxx - sx * sx
    val myy = n * syy - sy * sy
    val nn1 = n * (n - lit(1.0))
    df.groupBy(groupCol)
      .agg(
        count(lit(1)).cast("double").as("_n"),
        sum(x).cast("double").as("_sx"),
        sum(y).cast("double").as("_sy"),
        sum(x * y).cast("double").as("_sxy"),
        sum(x * x).cast("double").as("_sxx"),
        sum(y * y).cast("double").as("_syy"))
      .select(
        col(groupCol),
        n.cast("long").as("n"),
        round(mxy / (sqrt(mxx) * sqrt(myy)), 6).as("corr_xy"),
        round(mxy / nn1, 6).as("covar_xy"),
        round(sqrt(mxx / nn1), 6).as("stddev_x"),
        round(sqrt(myy / nn1), 6).as("stddev_y"))
  }

  /** Per-row z-score standardization of `xCol` against its group's
    * sample mean/stddev — the feature-normalization pass, from the
    * same exact decimal moments as [[corrStats]]: one group-sized
    * aggregate joined back onto the rows (AQE broadcasts it — group
    * cardinality, never data), the final expression in identical IEEE
    * doubles on both engines. Appends `zscore` (round 6); single-row
    * or zero-variance groups hit the same division-by-zero on both
    * engines. */
  def zscore(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val x = col(xCol).cast(DecimalType(18, 6))
    val n = col("_n"); val sx = col("_sx"); val sxx = col("_sxx")
    val moments = df.groupBy(groupCol)
      .agg(
        count(lit(1)).cast("double").as("_n"),
        sum(x).cast("double").as("_sx"),
        sum(x * x).cast("double").as("_sxx"))
    df.join(moments, groupCol)
      .withColumn("zscore",
        round((col(xCol) - sx / n) /
          sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0)))), 6))
      .drop("_n", "_sx", "_sxx")
  }
}
