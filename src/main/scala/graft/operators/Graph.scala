package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over edge DataFrames — the iterative
  * family [[Dedup.components]] started (min-label propagation), here
  * extended with PageRank: the link-analysis score that ranks
  * documents by citation structure (dedup survivor election, crawl
  * prioritization, seed-quality weighting are its pipeline uses).
  */
object Graph {

  /** PageRank over `edges` (src, dst) with damping `d`, `iterations`
    * synchronous power-iteration rounds from a uniform start.
    *
    * Per round — all DataFrame ops, one shuffle each on src then dst:
    * contributions = ranks ⋈ edges on src, pr/outdeg per edge;
    * new rank = (1−d)/N + d·(Σ contributions + danglingMass/N), where
    * the dangling mass (rank parked on nodes with no out-edges) is a
    * ONE-SCALAR driver aggregate per round — without it the scores
    * leak mass and drift from a probability distribution (Σpr stays 1,
    * spec-pinned). Lineage is cut per round by an eager
    * localCheckpoint, the [[Dedup.components]] precedent; the rank
    * state is node-sized, never edge-sized.
    *
    * Nodes are whatever appears as an endpoint; isolated nodes you
    * still want ranked must be added as self-free rows upstream.
    * Returns (node, pr). Deterministic: the per-node contribution sum
    * runs in DECIMAL(28,20) (exact for these magnitudes), so partial
    * aggregation order cannot wiggle low bits run to run. */
  def pagerank(edges: DataFrame, iterations: Int = 20,
               d: Double = 0.85): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    import org.apache.spark.sql.types.DecimalType
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outdeg, ranks("node") === outdeg("src"), "left")
      // rank parked on dangling nodes — one scalar back to the driver
      val danglingMass = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pr").cast(DecimalType(28, 20))), lit(0)))
        .head().getDecimal(0).doubleValue()
      val contribs = withDeg.filter(col("outdeg").isNotNull)
        .select(col("node").as("csrc"), (col("pr") / col("outdeg")).as("w"))
        .join(e, col("csrc") === e("src"))
        .groupBy(e("dst").as("node"))
        .agg(sum(col("w").cast(DecimalType(28, 20))).cast("double").as("contrib"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("contrib"), lit(0.0)) + lit(danglingMass / n)))
            .as("pr"))
        .localCheckpoint(true)
    }
    ranks
  }
}
