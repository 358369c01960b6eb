package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket association rules — pairwise co-occurrence with
  * support / confidence / lift, the first level of an FP-growth-style
  * frequent-itemset mine and the everyday "customers who bought X also
  * bought Y" query.
  *
  * Scale shape: the only quadratic step is the within-basket pair
  * self-join, and it is quadratic in BASKET SIZE (bounded — a retail
  * basket has tens of items), never in basket count: the equi-join on
  * the basket key shuffles each basket's items to one reducer and
  * emits C(m, 2) pairs per basket. Pair counts and item counts are
  * plain partial-aggregable groupBys; the final enrichment joins are
  * item-cardinality-sized (AQE broadcasts them), and the basket total
  * rides a broadcast one-row anchor — the corpus is never collected.
  *
  * Determinism: every metric is a ratio of EXACT int64 counts, cast to
  * double only at the final division — both engines divide identical
  * integers, so the result is bit-identical (round 6 guards the
  * display form).
  */
object Assoc {

  /** Association rules over `(basketCol, itemCol)` rows (duplicates
    * within a basket collapse first). Emits BOTH directions of every
    * unordered pair with co-occurrence ≥ `minPairSupport`:
    * `antecedent, consequent, pair_n, support, confidence, lift`
    * where support = pair_n / n_baskets, confidence = P(consequent |
    * antecedent), lift = confidence / P(consequent). */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            minPairSupport: Long = 2L): DataFrame = {
    // eager cuts: `items` (the deduped basket rows) feeds the basket
    // count, the item counts AND both sides of the pair self-join —
    // lazily the corpus-wide distinct re-ran four times; `pairs` feeds
    // both directions of the union. Each cut bounds its subtree to one
    // execution (guide §5; items is the operator's working set, pairs
    // is co-occurrence-sized).
    val items = Checkpoints.cut(baskets
      .select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct())
    val nBaskets = items.agg(countDistinct(col("_b")).as("_nb"))
    val itemCounts = items.groupBy(col("_i")).agg(count(lit(1)).as("_c"))
    val pairs = Checkpoints.cut(items.as("a")
      .join(items.as("b"),
        col("a._b") === col("b._b") && col("a._i") < col("b._i"))
      .groupBy(col("a._i").as("_x"), col("b._i").as("_y"))
      .agg(count(lit(1)).as("_cxy"))
      .filter(col("_cxy") >= minPairSupport))
    val directed = pairs
      .select(col("_x").as("antecedent"), col("_y").as("consequent"), col("_cxy"))
      .unionAll(pairs
        .select(col("_y").as("antecedent"), col("_x").as("consequent"), col("_cxy")))
    directed
      .join(itemCounts.select(col("_i"), col("_c").as("_ca")),
        col("antecedent") === col("_i")).drop("_i")
      .join(itemCounts.select(col("_i"), col("_c").as("_cc")),
        col("consequent") === col("_i")).drop("_i")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("antecedent"), col("consequent"),
        col("_cxy").as("pair_n"),
        round(col("_cxy").cast("double") / col("_nb").cast("double"), 6)
          .as("support"),
        round(col("_cxy").cast("double") / col("_ca").cast("double"), 6)
          .as("confidence"),
        // lift = (cxy * N) / (ca * cc): int64 products stay exact
        // (counts are corpus-bounded), one double division at the end
        round((col("_cxy") * col("_nb")).cast("double") /
          (col("_ca") * col("_cc")).cast("double"), 6).as("lift"))
  }
}
