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
    * lineage cut ([[Checkpoints.cut]]: reliable when graft.checkpointDir is set), the [[Dedup.components]] precedent; the rank
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
    // pre-partitioned on the per-iteration JOIN key and materialized
    // once: the checkpoint keeps its physical partitioning, so none of
    // the 20 iterations re-shuffles (or re-reads) the EDGE table — only
    // rank-sized exchanges remain in the loop (the Dedup.components
    // r9 rework, same reasoning)
    // lazy cuts: nodes.count() below reads every edge and node
    // partition, materializing both checkpoints in that one job
    // (Checkpoints.cutLazy — one job per cut saved, guide §5)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .transform(Checkpoints.cutLazy)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .transform(Checkpoints.cutLazy)
    val n = nodes.count()
    // lazy: the first iteration's danglingMass aggregate covers it
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .transform(Checkpoints.cutLazy)
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outdeg, ranks("node") === outdeg("src"), "left")
      // rank parked on dangling nodes — one scalar back to the driver
      val danglingMass = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pr").cast(DecimalType(28, 20))), lit(0)))
        .head().getDecimal(0).doubleValue()
      // fresh aliases per join: nodes/outdeg/e all descend from the one
      // checkpointed edge RDD, so dataset-qualified refs (e("src"))
      // would be ambiguous self-join columns
      val contribs = withDeg.filter(col("outdeg").isNotNull)
        .select(col("node").as("csrc"), (col("pr") / col("outdeg")).as("w"))
        .join(e.select(col("src").as("esrc"), col("dst").as("edst")),
          col("csrc") === col("esrc"))
        .groupBy(col("edst").as("node"))
        .agg(sum(col("w").cast(DecimalType(28, 20))).cast("double").as("contrib"))
      // lazy cut: the NEXT iteration's danglingMass aggregate (or the
      // caller's terminal action, on the last round) reads every rank
      // partition and materializes this checkpoint in the same job —
      // one job per iteration instead of two
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("contrib"), lit(0.0)) + lit(danglingMass / n)))
            .as("pr"))
        .transform(Checkpoints.cutLazy)
    }
    ranks
  }

  /** Flatten a parent-pointer hierarchy (org chart, category tree,
    * thread replies) to (node, root, depth) — what a recursive CTE
    * computes row-at-a-time, done here in O(log depth) DISTRIBUTED
    * rounds by pointer doubling: each round every node's ancestor
    * pointer jumps to its ancestor's ancestor and the hop counts add,
    * so a depth-10^6 chain resolves in ~20 self-joins instead of 10^6
    * sequential steps. A pre-round count detects the fixpoint (no
    * pointer left pointing below a root) before paying for a no-op
    * round; lineage cuts per round via Checkpoints.cut (reliable when graft.checkpointDir is set; the
    * components precedent).
    *
    * Input: (node, parent) with parent NULL marking roots; forests are
    * fine, and every non-null parent must itself appear as a node (the
    * jump is an inner join — a dangling parent would silently drop its
    * subtree, so feed complete closures). Cycles never converge — the
    * `maxRounds` guard throws rather than looping forever (2^64 depth
    * is unreachable, so hitting the guard means a cycle). */
  def flattenHierarchy(nodes: DataFrame, maxRounds: Int = 60): DataFrame = {
    // maxRounds caps BELOW per-row long-overflow territory: in a cycle
    // each row's depth doubles per round (2^60 by round 60) and the
    // per-row Long must stay exact for the guard to mean anything
    require(maxRounds <= 60,
      s"flattenHierarchy: maxRounds > 60 risks depth overflow, got $maxRounds")
    // lazy cut: totalDepth right below is a full-coverage aggregate
    // and materializes the checkpoint in the same job
    var st = nodes.select(
        col("node"),
        coalesce(col("parent"), col("node")).as("anc"),
        when(col("parent").isNull, lit(0L)).otherwise(lit(1L)).as("depth"))
      .transform(Checkpoints.cutLazy)
    // fixpoint detection rides the TOTAL depth: each round every
    // non-converged node's depth strictly grows, so an unchanged sum
    // means every pointer reached a root. One self-join per round
    // (jump + checkpoint), one cheap aggregate on the checkpointed
    // state — not a second probe join (review finding). The sum runs
    // as DECIMAL(38,0): a Long SUM wraps mod 2^64, and in a cycle
    // whose node count divides 2^k the wrapped total can repeat
    // across rounds and fake convergence before the maxRounds guard
    // fires (review finding) — n·2^60 ≲ 10^36 never wraps a
    // 38-digit decimal
    def totalDepth(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("depth").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var total = totalDepth(st)
    var rounds = 0
    var done = st.isEmpty
    while (!done) {
      rounds += 1
      require(rounds <= maxRounds,
        s"flattenHierarchy: no fixpoint after $maxRounds doubling rounds " +
          "— the parent pointers contain a cycle")
      st = st.as("a")
        .join(st.as("b"), col("a.anc") === col("b.node"))
        .select(col("a.node").as("node"), col("b.anc").as("anc"),
          (col("a.depth") + col("b.depth")).as("depth"))
        .transform(Checkpoints.cutLazy)
      val t = totalDepth(st)
      done = t.compareTo(total) == 0
      total = t
    }
    st.select(col("node"), col("anc").as("root"), col("depth"))
  }

  /** The k-core of an undirected graph — the maximal subgraph in which
    * every node keeps degree ≥ k. The standard cohesion filter: spam
    * farms and boilerplate link rings survive high k, incidental links
    * don't; in dedup graphs the k-core separates dense near-dup
    * cliques from chance pair collisions.
    *
    * Algorithm: synchronous peeling. Each round computes degrees over
    * the SURVIVING edge set (one groupBy) and drops every node below k
    * (one semi-join each side); removing a node can push its
    * neighbors below k, so the loop repeats until a fixpoint — the
    * round count is bounded by the peeling depth (≤ degeneracy-order
    * layers, logarithmic-ish on real graphs, never corpus-sized). The
    * edge set SHRINKS monotonically, so per-round cost falls; lineage
    * is cut per round with Checkpoints.cut (the components/
    * pagerank precedent), keeping the plan constant-size. The
    * fixpoint test rides the same count() that sizes the round —
    * no extra job.
    *
    * Returns (node, degree) of the k-core — degree measured INSIDE
    * the core (so every returned degree is ≥ k). Empty when no k-core
    * exists. */
  def kcore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"kcore: k must be >= 1, got $k")
    var und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.cutLazy)
    var nEdges = und.count()
    var done = nEdges == 0L
    while (!done) {
      val deg = und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      val pruned = und
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .transform(Checkpoints.cutLazy)
      val m = pruned.count()
      done = m == nEdges || m == 0L
      und = pruned
      nEdges = m
    }
    und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  /** Per-node triangle counts over an undirected graph given as (src,
    * dst) edge rows — the clustering/cohesion signal (community
    * tightness, link-spam detection, co-occurrence strength) and the
    * third graph primitive next to components and pagerank.
    *
    * Algorithm: degree orientation ("compact-forward"). Edges are
    * canonicalized to an undirected set, then each edge is DIRECTED
    * from its lower-(degree, id) endpoint to the higher one. That
    * yields an acyclic orientation whose max out-degree is O(√m)
    * regardless of how skewed the raw degree distribution is — a
    * celebrity node with 10^7 neighbors receives almost all its edges
    * INBOUND, so the wedge join below never builds its neighbor list
    * squared. Wedges a→b→c close into a triangle iff the a→c edge
    * exists (orientation is a total order, so a<b<c guarantees the
    * closing edge is oriented a→c); every triangle is counted exactly
    * once. Three shuffles on edge keys, all equi-joins, no cross
    * product; intermediate wedge count is Σ outdeg² ≤ m·√m.
    *
    * Returns (node, n_triangles) for every node in ≥1 triangle —
    * orientation relabeling never changes the triangle SET, so the
    * counts are identical to the naive id-ordered enumeration an
    * oracle runs. */
  def triangles(edges: DataFrame): DataFrame = {
    // eager cut: `und` feeds the degree count (twice, via the union)
    // and the orientation join — without the cut the CALLER's edge
    // derivation (often itself a join/aggregate) re-executes once per
    // reference, ~5x here (guide §5; edge-sized state, the
    // components-edges checkpoint precedent)
    val und = Checkpoints.cut(edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val lowerFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // eager cut: the oriented edge list feeds all THREE sides of the
    // wedge/closure joins — lazily that re-ran the canonicalize +
    // degree joins three times and tripled the plan (the
    // components-edges checkpoint precedent; edge-sized state)
    val oriented = Checkpoints.cut(und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lowerFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowerFirst, col("v")).otherwise(col("u")).as("b")))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val tri = wedges.as("w")
      .join(oriented.as("e3"),
        col("w.a") === col("e3.a") && col("w.c") === col("e3.b"))
      .select(col("w.a").as("a"), col("w.b").as("b"), col("w.c").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
