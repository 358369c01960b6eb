package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in id
  * order and chunked every `budget` tokens (the GPT-style
  * concat-and-chunk pipeline step). Each doc's global token OFFSET
  * determines its sequence: seq_id = offset / budget.
  *
  * The global exclusive prefix sum is the scale problem — a naive
  * `Window.orderBy(id)` with no partition key runs the whole corpus
  * through ONE reducer. This implements the classic distributed scan
  * instead:
  *
  *   1. range-repartition by id (partition k holds ids below
  *      partition k+1 — Spark's RangePartitioner, deterministic
  *      boundaries),
  *   2. per-partition exclusive cumsum (window partitioned by the
  *      physical partition id — parallel across partitions),
  *   3. per-partition token subtotals → driver (ONE ROW PER PARTITION,
  *      the only driver-side data), prefix-scanned and broadcast back,
  *   4. offset = partition prefix + local cumsum.
  *
  * The result is exact whatever the sampled range boundaries are: the
  * prefix sum telescopes across any split of a sorted sequence.
  *
  * Cost note: the subtotal collect and the final query each evaluate
  * the ranged scan — two passes over a TWO-COLUMN projection (id,
  * tokens), deliberately preferred to an internal persist the lazy
  * return value could never safely unpersist. Callers packing the same
  * corpus repeatedly should materialize the (id, n_tokens) projection
  * once themselves. PRECONDITION of that two-pass design: `docs` must
  * be a deterministic plan (file scans and pure transforms are;
  * rand() or an unseeded sample() is not), or the collected subtotals
  * and the final scan could disagree and misalign every downstream
  * offset — ReEvaluationSpec pins the two-evaluation agreement.
  */
object Packing {

  /** Exclusive prefix offsets over per-group subtotals — the bounded
    * driver-side half of a distributed scan (packSequences,
    * Sampling.deterministicShuffle). Input: one (group, subtotal) pair
    * per group, in scan order. Output: (group, offset of the group's
    * first element). The (seed, 0) sentinel + sliding-pairs collect is
    * the off-by-one-prone bit — keep it in exactly one place. */
  private[graft] def prefixOffsets[K](subtotals: Seq[(K, Long)], seed: K): Seq[(K, Long)] =
    subtotals.scanLeft((seed, 0L)) {
      case ((_, acc), (g, n)) => (g, acc + n)
    }.sliding(2).collect { case Seq((_, acc), (g, _)) => (g, acc) }.toSeq

  /** (id, n_tokens, offset, seq_id) for every doc: `offset` is the
    * doc's first-token position in the id-ordered concatenation,
    * `seq_id = offset / budget` its training sequence. */
  def packSequences(docs: DataFrame, tokens: org.apache.spark.sql.Column,
                    budget: Int, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val t = docs
      .select(col(idCol), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      .withColumn("pid", spark_partition_id())
    val local = Window.partitionBy("pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = t.withColumn(
      "loff", coalesce(sum("n_tokens").over(local), lit(0L)))
    // bounded driver hop: one (pid, subtotal) row per partition
    val subtotals = withLocal.groupBy("pid").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefixes = prefixOffsets(subtotals.toSeq, seed = 0)
    val prefixDf = docs.sparkSession
      .createDataFrame(prefixes).toDF("pid", "poff")
    withLocal
      .join(broadcast(prefixDf), "pid")
      .select(
        col(idCol), col("n_tokens"),
        (col("poff") + col("loff")).as("offset"),
        ((col("poff") + col("loff")) / budget).cast("long").as("seq_id"))
  }

  /** Length-bucketed micro-batching: docs whose token counts fall in
    * the same `bucketWidth`-wide bucket are grouped into batches of
    * `batchSize`, so each batch pads only to its own max length — the
    * standard padding-waste reducer for non-packed fine-tuning /
    * inference batching (packSequences is the pretraining shape; this
    * is the shape when docs must stay intact).
    *
    * Batch membership is deterministic and engine-portable: rows order
    * inside each bucket by (md5(id), id) — the same portable
    * permutation Sampling.stratified uses — and batch_in_bucket is
    * rank/batchSize. Scale: one shuffle on the bucket key; the
    * per-bucket window sorts on the reducer's spillable sort, nothing
    * driver-sized. Token counts are capped in practice so bucket
    * count is tiny; for a pathologically hot bucket pass `salts > 1`:
    * each bucket splits into `salts` deterministic sub-streams (hash
    * of the id), the window sorts |bucket|/salts rows per reducer,
    * and batch ids interleave as salt + salts·k — still unique within
    * the bucket, batches still never mix buckets, and all but at most
    * `salts` batches per bucket (one per sub-stream) stay exactly
    * full. */
  def lengthBuckets(docs: DataFrame, tokens: org.apache.spark.sql.Column,
                    bucketWidth: Int, batchSize: Int,
                    idCol: String = "doc_id", salts: Int = 1): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val t = docs
      .select(col(idCol), tokens.cast("long").as("n_tokens"))
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth))
    if (salts == 1) {
      val w = Window.partitionBy("bucket")
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
      t.withColumn("batch_in_bucket",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
    } else {
      val w = Window.partitionBy("bucket", "_salt")
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
      // floor BEFORE the salt arithmetic: Spark's `/` divides in
      // double, and a fractional batch index scaled by `salts` would
      // collide batch ids across salts
      t.withColumn("_salt", pmod(xxhash64(col(idCol).cast("string")), lit(salts.toLong)))
        .withColumn("batch_in_bucket",
          (col("_salt") + lit(salts.toLong) *
            floor((row_number().over(w) - 1) / batchSize)).cast("long"))
        .drop("_salt")
    }
  }

  /** Chat-template formatting — the step between a conversation table
    * and a training sequence: each conversation's turns concatenate in
    * order as `<|role|>content<|end|>` segments, and the spans a loss
    * mask should COVER (the content of `maskRoles` turns, tag bytes
    * excluded) come back as [start, end) character offsets into the
    * formatted text.
    *
    * Scale shape: one shuffle (the per-conversation window) + one
    * partial-aggregated groupBy; the offset arithmetic runs INSIDE a
    * codegen'd `aggregate` higher-order function over the collected
    * turn array — no UDF, no driver loop, conversations distribute
    * freely. A conversation's own turn list must fit in task memory
    * (real chats are kilobytes; a pathological million-turn "chat" is
    * a data bug this surfaces by OOM, not by silent truncation).
    *
    * Output: (conv, text, mask_spans ARRAY<STRUCT<start, end>>) —
    * one row per conversation, spans ordered by position. */
  def chatFormat(turns: DataFrame, convCol: String,
                 orderCols: Seq[org.apache.spark.sql.Column],
                 roleCol: String, contentCol: String,
                 maskRoles: Set[String]): DataFrame = {
    require(maskRoles.nonEmpty, "chatFormat: empty maskRoles set")
    val w = Window.partitionBy(col(convCol)).orderBy(orderCols: _*)
    val seg = concat(lit("<|"), col(roleCol), lit("|>"),
      col(contentCol), lit("<|end|>"))
    val masked = col(roleCol).isin(maskRoles.toSeq: _*)
    val perTurn = turns.select(col(convCol).as("conv"),
      row_number().over(w).as("rn"), seg.as("seg"),
      col(roleCol).as("role"), masked.as("masked"))
    perTurn.groupBy(col("conv"))
      .agg(sort_array(collect_list(struct(col("rn"), col("seg"),
        col("role"), col("masked")))).as("arr"))
      .select(col("conv"),
        expr("array_join(transform(arr, x -> x.seg), '')").as("text"),
        // running character offset + span emission, single pass
        expr(
          """aggregate(arr,
            |  struct(CAST(0 AS BIGINT) AS off,
            |         CAST(array() AS ARRAY<STRUCT<start: BIGINT, end: BIGINT>>) AS spans),
            |  (acc, x) -> struct(
            |    acc.off + length(x.seg),
            |    IF(x.masked,
            |       array_append(acc.spans, named_struct(
            |         'start', acc.off + length(x.role) + CAST(4 AS BIGINT),
            |         'end', acc.off + length(x.seg) - CAST(7 AS BIGINT))),
            |       acc.spans)),
            |  acc -> acc.spans)""".stripMargin).as("mask_spans"))
  }
}
