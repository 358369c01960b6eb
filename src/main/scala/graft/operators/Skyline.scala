package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) query — the rows no other row beats on
  * every dimension at once: minimize one column, maximize the other
  * ("cheapest for its size"). The textbook formulation is a NOT
  * EXISTS self-join — quadratic, a cross product at scale — so this
  * operator runs the classic two-phase shape instead:
  *
  *  1. **Staircase prune** (linear, one aggregate): bucketize the
  *     minimized column into `buckets` equi-width cells (one bounded
  *     scalar agg for the bounds), aggregate each cell's best
  *     maximized value (≤ `buckets` rows collected), and prefix-max
  *     them into a staircase. Every row in cell b has STRICTLY larger
  *     min-value than every row in cells < b, so a row whose max-value
  *     does not exceed the best of the earlier cells is dominated and
  *     dies in a codegen'd filter — at web scale this kills ~all rows.
  *  2. **Exact verify** (small): the survivors — staircase-shaped by
  *     construction — pairwise anti-join under the full dominance
  *     predicate (≤ on min, ≥ on max, strict somewhere). The survivor
  *     set is broadcast; the nested-loop is survivor² — data-dependent
  *     but typically tiny (the frontier plus near-frontier points),
  *     never corpus².
  *
  * Identical points dominate nothing (no strict inequality), so exact
  * duplicates on the frontier all survive — the same semantics the
  * NOT EXISTS oracle states. Rows with a NULL in either metric carry
  * no dominance information and are dropped up front (documented
  * contract — SQL three-valued logic would otherwise KEEP every null
  * row, which is never the analyst's intent).
  */
object Skyline {

  /** Skyline of `df` minimizing `minCol` and maximizing `maxCol`
    * (both numeric). Returns the input rows of the frontier.
    *
    * `maxCandidates` is the guard on the exact-verify stage: when the
    * staircase prune is ineffective (a constant or heavily-bottom-
    * concentrated minimized column leaves ~the whole corpus as
    * candidates) the broadcast nested-loop would be corpus² — the
    * operator REFUSES loudly instead of dying slowly, telling the
    * caller to raise `buckets` or pre-aggregate the dominated mass.
    * The check is one bounded count over the pruned set. */
  def skyline2(df: DataFrame, minCol: String, maxCol: String,
               buckets: Int = 64, maxCandidates: Long = 4000000L): DataFrame = {
    require(buckets >= 1, "skyline2: buckets must be >= 1")
    val in = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    val bounds: Row = in.agg(
      min(col(minCol)).cast("double"), max(col(minCol)).cast("double"))
      .collect()(0)
    if (bounds.isNullAt(0)) return in.limit(0)
    val lo = bounds.getDouble(0); val hi = bounds.getDouble(1)
    val width = (hi - lo) / buckets
    val bucketExpr =
      if (width == 0.0) lit(0)
      else least(floor((col(minCol).cast("double") - lit(lo)) / lit(width)),
        lit(buckets - 1)).cast("int")
    val withB = in.withColumn("_skb", bucketExpr)
    // ≤ `buckets` rows: the per-cell best of the maximized column
    val cellBest = withB.groupBy(col("_skb"))
      .agg(max(col(maxCol).cast("double")).as("_m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // prefix max over earlier cells = the dominance staircase
    val spark = df.sparkSession
    import spark.implicits._
    val stairs = (0 until buckets).scanLeft(Double.NegativeInfinity) {
      (acc, b) => math.max(acc, cellBest.getOrElse(b, Double.NegativeInfinity))
    }
    val stairDf = (0 until buckets)
      .map(b => (b, stairs(b))) // stairs(b) = best of cells strictly before b
      .toDF("_skb", "_best")
    val candidates = withB
      .join(broadcast(stairDf), Seq("_skb"), "left")
      .filter(col(maxCol).cast("double") > col("_best"))
      .drop("_best")
    val nCand = candidates.count()
    require(nCand <= maxCandidates,
      s"skyline2: staircase prune left $nCand candidates " +
        s"(> maxCandidates=$maxCandidates) — the minimized column is " +
        "too concentrated for equi-width cells; raise `buckets`, " +
        "pre-deduplicate dominated rows, or raise maxCandidates " +
        "knowingly (the verify stage is candidates²)")
    val q = candidates
      .select(col(minCol).as("_qmin"), col(maxCol).as("_qmax"))
    candidates.join(broadcast(q),
        col("_qmin") <= col(minCol) && col("_qmax") >= col(maxCol) &&
          (col("_qmin") < col(minCol) || col("_qmax") > col(maxCol)),
        "left_anti")
      .drop("_skb")
  }
}
