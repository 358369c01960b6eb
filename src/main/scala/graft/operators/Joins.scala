package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * skew at runtime; explicit salting is the static fallback when one
  * key dominates so hard that even split partitions overwhelm a task —
  * the left side spreads each key over `salts` sub-keys, the right
  * side replicates each row `salts` times, and the join key becomes
  * (key, salt). Replication cost is |right| × salts, so use it with a
  * small-ish right side and a genuinely pathological left.
  */
object Joins {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLeft
      .join(saltedRight, saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }

  /** Binned interval-overlap (range) join: rows of `points` matched to
    * every interval of `intervals` containing their position
    * (`start <= pos <= end`, plus optional equi-keys) — the
    * markers-in-gene-windows shape (reference: gwasDB/app.R:148-154
    * generalized from one window to a whole interval table).
    *
    * Spark plans a bare non-equi `BETWEEN` join as
    * BroadcastNestedLoopJoin — O(|points|·|intervals|) compares, fine
    * only when one side broadcasts. This form synthesizes an equi-key
    * instead: each interval explodes into the fixed-width bins it
    * covers, each point maps to exactly ONE bin, and the join is a
    * plain shuffled equi-join on `_bin` (+ user keys) with the exact
    * `BETWEEN` as a post-filter. A (point, interval) pair can only
    * meet in the point's single bin, so no dedup pass is needed.
    *
    * Scale: shuffle volume is |points| + Σ⌈width/binSize⌉ interval
    * replicas; compares per bin are local. Pick binSize ≈ the typical
    * interval width — smaller bins mean more interval replicas, larger
    * bins mean more false candidates filtered after the join, and
    * domain/binSize must comfortably exceed the cluster's parallelism
    * so bins don't become skewed mega-keys. [[suggestedBinSize]]
    * derives the median-width default in one bounded pre-pass.
    * Inverted intervals (start > end) match nothing and are dropped
    * before the explode (Spark's `sequence(a, b)` would count DOWNWARD
    * and fabricate bins). Null positions or bounds never match, like
    * SQL BETWEEN.
    *
    * `maxBinsPerInterval` guards the explode: ONE corrupt or
    * pathologically wide interval (end − start ~1e12 against a small
    * binSize) would otherwise throw from sequence()'s internal limit
    * or OOM the task with an undiagnosable error. An interval over the
    * cap fails fast with its own bounds in the message. The guard
    * rides inside the expression the join consumes, so no optimizer
    * rule can prune it, and it costs nothing on healthy rows. */
  def rangeJoin(points: DataFrame, posCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                binSize: Long,
                keys: Seq[(String, String)] = Nil,
                maxBinsPerInterval: Long = 1L << 16): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val p = points.withColumn("_bin", floor(col(posCol) / binSize))
    val nBins = floor(col(endCol) / binSize) - floor(col(startCol) / binSize) + 1
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bin",
        explode(
          when(nBins <= maxBinsPerInterval,
            sequence(floor(col(startCol) / binSize), floor(col(endCol) / binSize)))
          .otherwise(raise_error(concat(
            lit("rangeJoin: interval ["), col(startCol).cast("string"),
            lit(", "), col(endCol).cast("string"), lit("] spans "),
            nBins.cast("string"),
            lit(s" bins at binSize=$binSize, over maxBinsPerInterval=" +
              s"$maxBinsPerInterval — raise binSize (see suggestedBinSize) " +
              "or the cap, or filter the interval")))
            .cast("array<bigint>"))))
    val base = p("_bin") === i("_bin") &&
      p(posCol) >= i(startCol) && p(posCol) <= i(endCol)
    val cond = keys.foldLeft(base) { case (c, (pk, ik)) => c && p(pk) === i(ik) }
    p.join(i, cond).drop("_bin")
  }

  /** Bloom-filter semi-join reduction: prune `fact` rows whose key
    * cannot join `dim` BEFORE the join's shuffle moves them.
    *
    * This is the runtime-row-level-filter technique made explicit: when
    * the dim side is too large to broadcast exactly but its KEY SET
    * compresses into a Bloom filter (n distinct keys at fpp=1% is
    * ~1.2 bytes/key — 10^8 keys ≈ 120 MB, where the exact key set or
    * the rows themselves would be many GB), the filter rides to every
    * task and drops non-joining fact rows at scan time. At 100 TB the
    * shuffle then carries only `|matching| + fpp·|fact|` rows instead
    * of `|fact|`. Spark's own `runtime.bloomFilter` optimization fires
    * on the same pattern but only when its heuristics see a selective
    * creation-side filter; this operator is the deterministic,
    * composable form (and the filter is reusable across queries via
    * [[keyBloom]]).
    *
    * Build is one tree-aggregated pass over dim's hashed keys; the only
    * driver-side data is the filter itself (bounded by `fpp` and the
    * key count, never by row count — same bounded-collect contract as
    * Ivf centroids). Both sides hash with `xxhash64`, so keys of any
    * type work and a fact key present in dim can NEVER be dropped
    * (identical deterministic hash ⇒ no false negatives); false
    * positives are removed by the exact join that follows, so results
    * are exactly the plain join's. */
  def keyBloom(dim: DataFrame, dimKey: String,
               expectedItems: Long = 0L, fpp: Double = 0.01): Array[Byte] = {
    val bf = keyBloomFilter(dim, dimKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The filter itself (not its bytes) — the input to the BROADCAST
    * probe path below. Supplying `expectedItems` skips the sizing
    * `dim.count()` pass entirely — at 100 TB the key count is usually
    * known (table stats, manifest row counts), so prefer passing it. */
  def keyBloomFilter(dim: DataFrame, dimKey: String,
                     expectedItems: Long = 0L, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter = {
    val n = if (expectedItems > 0) expectedItems else dim.count()
    // Spark's stat.bloomFilter NPEs on a ZERO-ROW input (null aggregate
    // buffer); an empty dim means nothing can join, which an empty
    // filter expresses exactly. The isEmpty probe runs only when the
    // caller supplied expectedItems (otherwise n already tells us) and
    // is a bounded limit-1 scan.
    if (n == 0 || (expectedItems > 0 && dim.isEmpty))
      org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
    else dim.select(xxhash64(col(dimKey)).as("_h"))
      .stat.bloomFilter("_h", n, fpp)
  }

  /** `fact` restricted to rows whose key might join `dim` — the probe
    * side of the reduction, usable standalone (e.g. ahead of several
    * joins against the same dim).
    *
    * Size ceiling: the serialized filter bytes ride INSIDE the
    * expression tree, so they re-ship with every task binary. Fine to
    * a few MB; beyond that (the 10^8-key / ~120 MB regime) use
    * [[bloomSemiFilterBroadcast]], which ships the filter once per
    * executor as a broadcast variable and carries only the handle in
    * the plan. */
  def bloomSemiFilter(fact: DataFrame, factKey: String,
                      filterBytes: Array[Byte]): DataFrame =
    fact.filter(graft.functions.BloomFunctions.bloom_might_contain(
      xxhash64(col(factKey)), filterBytes))

  /** Broadcast-variable probe for LARGE filters: identical semantics to
    * [[bloomSemiFilter]], but the filter travels the broadcast path
    * (once per executor) instead of the task-binary path (once per
    * task). The caller owns the broadcast's lifecycle — `destroy()` it
    * when the last query using the filter is done. */
  def bloomSemiFilterBroadcast(
      fact: DataFrame, factKey: String,
      bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      : DataFrame =
    fact.filter(graft.functions.BloomFunctions.bloom_might_contain_bcast(
      xxhash64(col(factKey)), bf))

  /** Exact inner join with the bloom reduction applied to the fact
    * side first: identical results to `fact.join(dim, fact(factKey) ===
    * dim(dimKey))`, with the shuffle shrunk to the matching rows plus
    * the fpp-bounded false-positive residue. */
  def bloomJoin(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomSemiFilter(fact, factKey, keyBloom(dim, dimKey, expectedItems, fpp))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** One-pass binSize heuristic for [[rangeJoin]]: the approximate
    * median interval width (inverted intervals excluded, like the join
    * itself). A bin sized at the median width keeps interval replicas
    * near 2× while bounding false candidates per bin — the explicit
    * parameter stays the override for callers who know their domain. */
  def suggestedBinSize(intervals: DataFrame, startCol: String, endCol: String): Long = {
    val w = intervals
      .filter(col(startCol) <= col(endCol))
      .select((col(endCol).cast("double") - col(startCol).cast("double") + 1.0).as("_w"))
    w.stat.approxQuantile("_w", Array(0.5), 0.01)
      .headOption.map(m => math.max(1L, m.toLong)).getOrElse(1L)
  }
}
