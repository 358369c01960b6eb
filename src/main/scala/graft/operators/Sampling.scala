package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample()` is fine for quick estimates but useless for a
  * REPRODUCIBLE corpus: it is seed-and-partitioning dependent, and it
  * cannot hit an exact per-stratum quota. Stratified sampling here is
  * exact and engine-portable: rows are ordered inside each stratum by
  * the md5 of their id — a deterministic pseudo-random permutation any
  * engine reproduces bit-for-bit — and the first ceil(frac·n) rows of
  * each stratum are kept. Balancing a training mix across languages /
  * sources / quality buckets is exactly this operation.
  *
  * Scale: one shuffle on the stratum key; the per-stratum sort is a
  * window over (stratum, md5) — rows spill, nothing driver-sized. A
  * skewed stratum sorts on one reducer's disk, not in its memory; for
  * truly pathological strata pre-split the stratum key (salt) and take
  * quota per split.
  */
object Sampling {

  /** Exact deterministic stratified sample: keeps ceil(frac · |stratum|)
    * rows per stratum, chosen by md5-of-id order (ties broken by id).
    * Output: input columns + `stratum`. */
  def stratified(df: DataFrame, stratum: Column, frac: Double,
                 idCol: String = "doc_id"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val tagged = df.withColumn("stratum", stratum)
    val order = Window.partitionBy("stratum")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val quota = Window.partitionBy("stratum")
    tagged
      .withColumn("rk", row_number().over(order))
      .withColumn("n", count(lit(1)).over(quota))
      .filter(col("rk") <= ceil(lit(frac) * col("n")))
      .drop("rk", "n")
  }
}
