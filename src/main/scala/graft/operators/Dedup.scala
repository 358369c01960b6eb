package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale text corpus.
  *
  * Scale design: exact dedup shuffles (hash, id) pairs only; MinHash/LSH
  * is the linear-time near-dup path — candidate pairs come from band
  * buckets, never from an all-pairs product; exact n-gram Jaccard runs
  * only as a *verify* stage on LSH candidates, so the expensive set
  * intersection touches candidate pairs, not the corpus squared.
  */
object Dedup {

  /** Exact duplicate groups keyed by sha2-256 of the content column.
    * Returns (keep_id, n_copies, h) — keep_id is the smallest id in the
    * group (the canonical survivor). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "h")
      .orderBy("keep_id")

  /** Distinct word-k-gram shingles per document: (doc_id, sh). */
  def shingles(docs: DataFrame, k: Int): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= k)
      .withColumn(
        "sh",
        expr(s"array_distinct(transform(sequence(0, size(toks)-$k), i -> concat_ws(' ', slice(toks, i+1, $k))))"))
      .select(col("doc_id"), explode(col("sh")).as("sh"))

  /** MinHash signatures: one row per doc with numHashes min-hash values.
    * Hash family: xxhash64 seeded per signature index — deterministic,
    * codegen'd, no UDF. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("sh"))).as(s"s$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * `rowsPerBand`; docs sharing any band bucket become a candidate.
    * The self-join keys on (band, bucket-hash), so each signature is
    * shuffled once and pair generation is local to a bucket. */
  def minhashCandidates(docs: DataFrame, shingleK: Int = 2, bands: Int = 16,
                        rowsPerBand: Int = 2): DataFrame = {
    val sigs = minhashSignatures(shingles(docs, shingleK), bands * rowsPerBand)
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}"))
      xxhash64(cols: _*)
    }
    val banded = sigs
      .withColumn("bands", array(bandCols: _*))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    banded.as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 64-bit fingerprint from token-frequency-weighted bit votes;
    * near-dup pairs block on 16-bit fingerprint chunks (a doc pair within
    * hamming distance 16 must share at least one of 4 chunks), then
    * verify with bit_count(xor) — all built-in, codegen'd bit math. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map { j =>
      sum(
        when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, col("cnt"))
          .otherwise(-col("cnt"))).as(s"b$j")
    }
    val fpTerms = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    val fps = tokens
      .groupBy("doc_id")
      .agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("fp", fpTerms.reduce(_ + _))
      .select("doc_id", "fp")
    val chunkCols = (0 until 4).map(i =>
      shiftrightunsigned(col("fp"), 16 * i).bitwiseAND(lit(0xffffL)))
    val chunked = fps
      .withColumn("chunks", array(chunkCols: _*))
      .select(col("doc_id"), col("fp"), posexplode(col("chunks")).as(Seq("ci", "cv")))
    chunked.as("a")
      .join(
        chunked.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard, verify-stage style: computed only for LSH
    * candidate pairs. Intersection counts come from joining each side's
    * shingle set through the candidate list; union = |A| + |B| − |A∩B|. */
  def ngramJaccard(docs: DataFrame, shingleK: Int = 2, minJaccard: Double = 0.25): DataFrame = {
    val cands = minhashCandidates(docs, shingleK)
    val sh = shingles(docs, shingleK)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val inter = cands
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }
}
