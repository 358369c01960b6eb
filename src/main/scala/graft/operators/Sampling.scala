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
  * truly pathological strata pass `salts > 1` to [[weighted]], which
  * pre-splits each stratum and recombines exact quotas.
  */
object Sampling {

  /** Exact deterministic stratified sample: keeps ceil(frac · |stratum|)
    * rows per stratum, chosen by md5-of-id order (ties broken by id).
    * Output: input columns + `stratum`. The uniform special case of
    * [[weighted]] (the spec pins the equivalence). */
  def stratified(df: DataFrame, stratum: Column, frac: Double,
                 idCol: String = "doc_id"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    weighted(df, stratum, Map.empty, defaultFrac = frac, idCol = idCol)
  }

  /** Per-stratum sampling fractions — the data-mix form of
    * [[stratified]]: each stratum keeps its OWN fraction (upweight
    * curated domains, downweight crawl), unlisted strata fall back to
    * `defaultFrac`, and a fraction of 0 drops the stratum entirely.
    * Same engine-portable md5 permutation and exact ceil(frac·n)
    * quotas; same single shuffle on the stratum key.
    *
    * Keys: a `String` key compares against the stratum's canonical
    * string form (`CAST(stratum AS STRING)` — the legacy contract, so
    * `"0"` matches an int stratum 0); any other key type compares
    * natively against the stratum's own type (so `0.5` matches a
    * double stratum exactly, with no string-format coupling).
    *
    * `salts > 1` splits every stratum into `salts` deterministic
    * sub-strata (hash of the id), takes a per-split quota, and
    * recombines EXACTLY to ceil(frac·n) per stratum via
    * largest-remainder allocation over a bounded driver hop (one
    * (stratum, salt, count) row per occupied split — strata
    * cardinality is already caller-bounded, it parameterizes
    * `fracs`). Use it when one stratum dominates the corpus: the
    * per-split window sorts |stratum|/salts rows per reducer instead
    * of the whole hot stratum on one. The selected SET differs from
    * salts=1 (rows are ranked within splits, not globally) but is
    * equally deterministic and hits the identical per-stratum
    * quota. */
  def weighted(df: DataFrame, stratum: Column, fracs: Map[Any, Double],
               defaultFrac: Double = 0.0, idCol: String = "doc_id",
               salts: Int = 1): DataFrame = {
    require((fracs.values.toSeq :+ defaultFrac).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0, 1]: $fracs / $defaultFrac")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val fracCol = fracs.foldLeft(lit(defaultFrac)) { case (acc, (k, f)) =>
      val cond = k match {
        case s: String => stratum.cast("string") === lit(s)
        case other     => stratum === lit(other)
      }
      when(cond, lit(f)).otherwise(acc)
    }
    val tagged = df.withColumn("stratum", stratum).withColumn("_frac", fracCol)
    if (salts == 1) {
      val order = Window.partitionBy("stratum")
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
      val quota = Window.partitionBy("stratum")
      tagged
        .withColumn("rk", row_number().over(order))
        .withColumn("n", count(lit(1)).over(quota))
        .filter(col("rk") <= ceil(col("_frac") * col("n")))
        .drop("rk", "n", "_frac")
    } else saltedWeighted(tagged, idCol, salts)
  }

  /** The salted quota path of [[weighted]]: per-(stratum, salt) counts
    * collect to the driver (bounded), largest-remainder allocation
    * splits each stratum's exact ceil(frac·n) quota across its salts
    * (fractional shares floor, the remainder goes to the largest
    * fractional parts, ties to the lower salt — fully deterministic),
    * and the per-split window takes its own quota. */
  private def saltedWeighted(tagged: DataFrame, idCol: String, salts: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = tagged.sparkSession
    val salted = tagged.withColumn("_salt",
      pmod(xxhash64(col(idCol).cast("string")), lit(salts.toLong)))
    val counts = salted.groupBy("stratum", "_salt")
      .agg(count(lit(1)).as("n"), first("_frac").as("f"))
      .collect()
    val quotaRows = counts.groupBy(r => r.get(0)).toSeq.flatMap { case (sv, rows) =>
      val n = rows.map(_.getAs[Long]("n")).sum
      val q = math.ceil(rows.head.getAs[Double]("f") * n).toLong
      val shares = rows.map(r =>
          (r.getAs[Long]("_salt"), q.toDouble * r.getAs[Long]("n") / n))
        .sortBy(_._1)
      val base = shares.map { case (s, sh) => (s, sh.toLong) }
      val rem = (q - base.map(_._2).sum).toInt
      val bonus = shares.map { case (s, sh) => (s, sh - math.floor(sh)) }
        .sortBy { case (s, fr) => (-fr, s) }.take(rem).map(_._1).toSet
      base.map { case (s, b) => Row(sv, s, b + (if (bonus(s)) 1L else 0L)) }
    }
    val schema = StructType(Seq(
      tagged.schema("stratum").copy(name = "_qs"),
      StructField("_qsalt", LongType, nullable = false),
      StructField("_q", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val quotaDf = spark.createDataFrame(quotaRows.asJava, schema)
    val w = Window.partitionBy("stratum", "_salt")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    salted
      .join(broadcast(quotaDf),
        salted("stratum") <=> quotaDf("_qs") && salted("_salt") === quotaDf("_qsalt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("_q"))
      .drop("rk", "_q", "_qs", "_qsalt", "_salt", "_frac")
  }

  /** Temperature-based domain mixture sampling — the multilingual /
    * multi-source rebalancing rule (the mBERT/XLM exponent): domain d
    * with n_d rows gets a share of the `targetN`-row budget
    * proportional to n_d^alpha. alpha = 1 reproduces the corpus mix,
    * alpha = 0 flattens toward uniform, alpha in between upweights the
    * tail — the standard knob for keeping low-resource domains alive
    * in a training mix.
    *
    * Shares resolve to EXACT integer quotas by largest-remainder
    * allocation (floor every share, distribute the leftover to the
    * largest fractional parts, ties to the lower domain), capped at
    * n_d — an over-subscribed domain is exhausted, not redistributed
    * (the realized total can undershoot targetN; document over
    * surprise). Row selection inside a domain is the same
    * engine-portable md5-of-id permutation as [[weighted]].
    *
    * Determinism across engines: n_d^alpha is rounded through
    * DECIMAL(18,6) per domain and the normalizer is an exact decimal
    * sum, so the floor/remainder arithmetic sees bit-identical doubles
    * everywhere (alpha = 0.5 uses `sqrt`, correctly rounded in IEEE —
    * `pow` is only ~1 ulp and could flip a floor at an integer
    * boundary; prefer 0.5 when the oracle must match bit-exact).
    *
    * Scale: the quota table is one row per DOMAIN — its unpartitioned
    * windows are bounded by domain cardinality (a caller-chosen small
    * set, same contract as `fracs` in [[weighted]]), never by corpus
    * size. The corpus sees one groupBy(domain) count, one broadcast
    * quota join, one window rank per domain — a single data shuffle. */
  def temperature(df: DataFrame, domain: Column, alpha: Double, targetN: Long,
                  idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(targetN >= 0L, s"targetN must be >= 0, got $targetN")
    val tagged = df.withColumn("domain", domain)
    val raw = if (alpha == 0.5) sqrt(col("n").cast("double"))
              else pow(col("n").cast("double"), lit(alpha))
    val all = Window.partitionBy() // one row per domain: bounded
    val quotas = tagged.groupBy("domain").agg(count(lit(1)).as("n"))
      .withColumn("w", raw.cast(DecimalType(18, 6)).cast("double"))
      .withColumn("_wsum",
        sum(col("w").cast(DecimalType(18, 6))).over(all).cast("double"))
      .withColumn("share", lit(targetN.toDouble) * col("w") / col("_wsum"))
      .withColumn("base", floor(col("share")).cast("long"))
      .withColumn("fr", col("share") - floor(col("share")))
      .withColumn("rem", lit(targetN) - sum("base").over(all))
      .withColumn("rk",
        row_number().over(Window.partitionBy().orderBy(desc("fr"), col("domain"))))
      .withColumn("quota",
        least(col("n"),
          col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L)))
      .select(col("domain").as("_qd"), col("quota"))
    val w = Window.partitionBy("domain")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    tagged
      .join(broadcast(quotas), tagged("domain") <=> quotas("_qd"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= col("quota"))
      .drop("_rk", "quota", "_qd")
  }

  /** Per-domain TOKEN-budget sampling — the unit a training mix is
    * actually specified in ("20 B tokens of code, 5 B of forums"), not
    * rows: walk each domain in the engine-portable md5-of-id order and
    * keep greedy-prefix rows while the domain's running token total
    * stays within `budget`. The first row to overflow (and everything
    * after it) drops, so the realized total is the largest md5-prefix
    * sum ≤ budget — deterministic on any engine, no fractional docs.
    *
    * Output: input columns + `domain` + `cum_tokens` (the running
    * total INCLUDING the row — the consumer's progress meter).
    * Token counts are integers, so the running sum is exact — no
    * float-order caveats. One shuffle on the domain key; the running
    * sum is a per-domain window, spill-safe like [[weighted]]. */
  def tokenBudget(df: DataFrame, domain: Column, tokens: Column, budget: Long,
                  idCol: String = "doc_id"): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val w = Window.partitionBy("domain")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("domain", domain)
      .withColumn("_tok", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("_tok")).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("_tok")
  }

  /** Explicit DATA-MIXTURE sampling with repetition-capped
    * up-sampling — the recipe step behind "web 0.6, books 0.2, code
    * 0.15, wiki 0.05 for this run": domain d's token target is
    * `budget × weight(d)` (weights normalize), and a domain with
    * FEWER tokens than its target REPEATS — whole epochs first, then a
    * deterministic md5-order prefix of one partial epoch — but never
    * beyond `maxRepeat` total epochs (past that, up-sampling stops
    * paying; the capped domain under-fills its slice and the output's
    * per-domain totals make that visible to the caller). Domains
    * without a weight are excluded (weight zero).
    *
    * Output: one row per (document, epoch) — `domain`, `epoch`
    * (0-based), `cum_tokens` (the running md5-order total inside the
    * domain, same meter as [[tokenBudget]]). Epoch replication
    * multiplies METADATA rows only; downstream joins fetch text by id
    * per epoch, the corpus itself never duplicates on the shuffle.
    *
    * Plan: one domain-cardinality aggregate (availability, broadcast
    * back), one per-domain window cumsum, one `sequence` explode for
    * the epochs — the corpus shuffles once, on the domain key. All
    * arithmetic is integer (targets truncate), so engine parity is
    * exact. */
  def mixture(df: DataFrame, domain: Column, tokens: Column,
              weights: Map[String, Double], budget: Long,
              maxRepeat: Int = 4, idCol: String = "doc_id"): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0) &&
      weights.values.sum > 0.0, "weights must be non-negative, not all zero")
    val spark = df.sparkSession
    import spark.implicits._
    val wsum = weights.values.sum
    val wDf = weights.toSeq.map { case (d, wt) => (d, wt / wsum) }
      .toDF("domain", "_wt")
    val base = df.withColumn("domain", domain)
      .withColumn("_tok", tokens.cast("long"))
    val plan = base.groupBy("domain").agg(sum("_tok").as("_av"))
      // a zero-token domain contributes nothing to a token budget and
      // must not ride the epoch arithmetic (div-by-zero nulls would
      // otherwise silently up-sample it to the repeat cap)
      .filter(col("_av") > 0L)
      .join(wDf, Seq("domain"))
      .withColumn("_target", floor(lit(budget.toDouble) * col("_wt")).cast("long"))
      // whole epochs the target affords, capped; the partial-epoch
      // remainder is zero exactly when the cap bound (no more repeats)
      .withColumn("_full", least(expr("_target div _av"), lit(maxRepeat.toLong)))
      .withColumn("_rem", when(expr("_target div _av") >= maxRepeat, lit(0L))
        .otherwise(col("_target") - col("_full") * col("_av")))
      .select("domain", "_full", "_rem")
    val w = Window.partitionBy("domain")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_tokens", sum(col("_tok")).over(w))
      .join(broadcast(plan), Seq("domain"))
      .withColumn("_epochs", col("_full") +
        when(col("cum_tokens") <= col("_rem"), 1L).otherwise(0L))
      // sequence(0, -1) would DESCEND — zero-epoch rows need an
      // explicit empty array, not a reversed range
      .withColumn("epoch", explode(when(col("_epochs") > 0L,
        sequence(lit(0L), col("_epochs") - 1L))
        .otherwise(array().cast("array<bigint>"))))
      .drop("_tok", "_full", "_rem", "_epochs")
  }

  /** Weight-proportional sampling WITHOUT replacement (the
    * Efraimidis–Spirakis key trick), made deterministic: each row
    * draws u ∈ (0, 1] from its own id's md5 (first 8 hex chars parsed
    * as an integer — the engine-portable pseudo-random the whole
    * sampling family rides) and the k rows with smallest
    * key = −ln(u)/w win, which is exactly a weight-proportional
    * without-replacement draw. Upweighting a document multiplies its
    * inclusion odds without ever duplicating rows — the "prefer
    * curated, keep some of everything" mix step that per-stratum
    * fractions ([[weighted]]) can't express when the weight is a
    * continuous per-row score.
    *
    * Shapes: one scan computes keys (pure codegen arithmetic), then a
    * TakeOrderedAndProject top-k — never a full sort. Determinism:
    * keys round through 6 decimals with ties broken by id, so the
    * selected SET is stable cross-engine even where ln() differs in
    * the last ulp. Weights must be strictly positive. */
  /** Deterministic fixed-k uniform sample PER GROUP — the eval-set /
    * inspection ask the fraction-based samplers cannot spell ("100
    * examples from EVERY source, however big the source is"): each
    * group's rows rank by a salted md5 draw over the id and the k
    * smallest survive. md5 is uniform over the id space and
    * engine-portable (the DuckDB oracle replays the identical draw),
    * so a fixed salt reproduces the SET bit-for-bit anywhere while a
    * new salt draws an independent sample. One shuffle on the group
    * key through the native TopKPerGroup operator — per-partition
    * k-bounded heaps, no per-group full sort, state k·groups however
    * large the groups are. */
  def perGroupK(df: DataFrame, group: Column, k: Int,
                idCol: String = "doc_id", salt: String = "s0"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val drawn = df.withColumn("_draw",
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))))
    graft.plans.TopK.topKPerGroup(drawn, Seq(group),
      Seq(col("_draw").asc, col(idCol).asc), k)
      .drop("_draw")
  }

  def weightProportional(df: DataFrame, weight: Column, k: Int,
                         idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    // the documented "strictly positive" contract is ENFORCED in the
    // plan: a zero/negative/null/NaN weight would otherwise yield an
    // Infinity/negative/null/NaN key that deterministically wins (or
    // poisons, or silently excludes — NaN compares greater than any
    // number in Spark, so `<= 0` alone misses it and the NaN key sorts
    // last forever) the top-k instead of failing (review findings)
    val checked = when(col("_w").isNull || isnan(col("_w")) || col("_w") <= 0.0,
      raise_error(concat(
        lit("Sampling.weightProportional: weight must be strictly positive, got "),
        coalesce(col("_w").cast("string"), lit("null")))).cast("double"))
      .otherwise(col("_w"))
    df.withColumn("_w", weight.cast("double"))
      .withColumn("samp_key", round(-log(u) / checked, 6))
      .drop("_w")
      .orderBy(col("samp_key"), col(idCol))
      .limit(k)
  }

  /** Deterministic global shuffle: assigns every row a dense permuted
    * position `shuffle_pos` ∈ [0, n) ordered by md5(salt#id) — the
    * reproducible "shuffle the corpus once per epoch" step of a
    * training pipeline (vary `salt` per epoch for a fresh permutation
    * that any engine reproduces bit-for-bit).
    *
    * The scale problem is the dense global rank: a bare
    * `row_number() OVER (ORDER BY key)` funnels the corpus through ONE
    * reducer. Instead the md5 key's leading `prefixChars` hex chars
    * form ≤16^prefixChars ORDER-PRESERVING buckets (lowercase hex
    * sorts lexicographically = numerically, and md5 spreads rows
    * uniformly so buckets can't skew): rank = driver prefix over the
    * tiny bucket-count table + per-bucket window rank. One shuffle on
    * the bucket key, one bounded driver hop (≤4096 rows at the
    * default), never a single-reducer sort.
    *
    * Cost note: like packSequences, the bucket-count collect and the
    * returned plan each evaluate the keyed scan — two passes over an
    * (id)-projection, preferred to an internal persist the lazy return
    * value could never safely unpersist. PRECONDITION of that
    * two-pass design: `df` must be a deterministic plan (file scans
    * and pure transforms are; rand() or an unseeded sample() is not),
    * or the counted buckets and the ranked rows could disagree —
    * ReEvaluationSpec pins the two-evaluation agreement. */
  def deterministicShuffle(df: DataFrame, idCol: String = "doc_id",
                           salt: String = "0", prefixChars: Int = 3): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars must be in [1, 8], got $prefixChars")
    val keyed = df
      .withColumn("shuffle_key",
        md5(concat_ws("#", lit(salt), col(idCol).cast("string"))))
      .withColumn("_bucket",
        conv(substring(col("shuffle_key"), 1, prefixChars), 16, 10).cast("long"))
    val w = Window.partitionBy("_bucket").orderBy(col("shuffle_key"), col(idCol))
    val local = keyed.withColumn("_lrank", row_number().over(w).cast("long") - 1)
    // bounded driver hop: one (bucket, count) row per OCCUPIED bucket
    val counts = local.groupBy("_bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val prefixes = Packing.prefixOffsets(counts.toSeq, seed = 0L)
    val prefixDf = df.sparkSession.createDataFrame(prefixes).toDF("_bucket", "_poff")
    local
      .join(broadcast(prefixDf), "_bucket")
      .withColumn("shuffle_pos", col("_poff") + col("_lrank"))
      .drop("_bucket", "_lrank", "_poff")
  }
}
