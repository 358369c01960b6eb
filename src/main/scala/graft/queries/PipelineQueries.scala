package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, element_at, explode, floor, length, lit, pmod, round, sequence, size, slice, split, transform, when}

import graft.operators.{Dedup, Ivf, Multimodal, Packing, Pq, Sampling, Similarity, TextOps}
import graft.tables.Tables._

/** Training-data pipeline operators (SURVEY §2c) wired to the driver
  * contract. MinHash/SimHash/LSH internals are not SQL-expressible, so
  * those entries are rows-only (no oracle) and carry ScalaTest
  * invariants instead.
  */
object PipelineQueries {

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => Dedup.exact(documents(s, d))),
    // planted-coverage gates (r17 verdict #7, the 26ec pattern): ten
    // VERBATIM twins of corpus docs ride the full operator — identical
    // text → identical signature/fingerprint/shingles → every band and
    // chunk key matches, so the ten cross-pairs are GUARANTEED (not
    // probabilistic) and the emitted coverage rows hash-verify against
    // DuckDB. The banded self-join over corpus+plants runs whole (the
    // gate wraps the operator, it does not shrink it); probabilistic
    // near-dup recall on PERTURBED plants stays spec'd in the suites.
    "dedup_minhash" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.minhashCandidates(docs.unionByName(planted))
        .filter(col("doc_b") === col("doc_a") + 1000000L)
        .select(col("doc_a").as("doc_id"), lit(true).as("planted_caught"))
        .orderBy("doc_id")
    }),
    "dedup_simhash" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.simhashPairs(docs.unionByName(planted))
        .filter(col("doc_b") === col("doc_a") + 1000000L)
        // identical text → identical 64-bit fingerprint → hamming 0,
        // an EXACT column the oracle replays
        .select(col("doc_a").as("doc_id"), col("hamming").cast("int").as("hamming"))
        .orderBy("doc_id")
    }),
    // cache=false: driver sessions run ~60 queries back to back — a
    // persisted shingle set would leak storage for the session lifetime
    "dedup_ngram_jaccard" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.ngramJaccard(docs.unionByName(planted), cache = false)
        .filter(col("doc_b") === col("doc_a") + 1000000L)
        // identical shingle sets → exact jaccard 1.0
        .select(col("doc_a").as("doc_id"), col("jaccard"))
        .orderBy("doc_id")
    }),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingDupPairs(embeddings(s, d), minCosine = 0.2)),
    // SemDeDup: one disposition row per vector — rows-only (KMeans
    // cluster geometry is not SQL-expressible); the planted-twin
    // collapse and keeper-rule invariants live in PipelineQueriesSpec
    "dedup_semantic" -> ((s, d) =>
      Dedup.semanticDedup(embeddings(s, d), tau = 0.2)),
    // incremental ingest dedup: the batch re-presents five corpus docs
    // verbatim under new ids — identical signatures share every band,
    // so the five cross-candidates are GUARANTEED, not probabilistic
    // (rows-only: minhash internals)
    "dedup_incremental" -> ((s, d) => {
      val docs = documents(s, d)
      val batch = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.incrementalCandidates(batch, Dedup.bandedSignatures(docs))
        .orderBy("new_id", "corpus_id")
    }),
    // the incremental-ingest GATE decision, oracle-exact by planted
    // truth: the batch is five VERBATIM re-presents (guaranteed band
    // candidates, exact jaccard 1.0 → always rejected) plus five
    // NOVEL docs built from tokens the synthetic corpus cannot contain
    // (true jaccard 0 → always admitted; even a spurious band
    // collision is killed by the exact-jaccard verify). The admitted
    // set is therefore deterministic — exactly the novel ids — even
    // though the banding internals stay hash-dependent.
    "dedup_incremental_gate" -> ((s, d) => {
      import org.apache.spark.sql.functions.format_string
      val docs = documents(s, d)
      val represent = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val novel = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          format_string("zzq%d zzr%d zzs%d zzt%d zzu%d zzv%d",
            col("doc_id"), col("doc_id"), col("doc_id"),
            col("doc_id"), col("doc_id"), col("doc_id")).as("text"))
      Dedup.incrementalIngest(represent.unionByName(novel), docs,
          Dedup.bandedSignatures(docs), minJaccard = 0.5)
        .select("doc_id").orderBy("doc_id")
    }),
    "sim_cosine_topk" -> ((s, d) => Similarity.cosineTopK(embeddings(s, d))),
    // cross-corpus similarity join, planted-twin gated (r17 verdict
    // #7): the incoming batch carries verbatim copies of twenty
    // reference vectors — an identical vector lands in the SAME bucket
    // of every hash table, so its candidate pair is guaranteed and its
    // exact-cosine verify reads 1.0. The banded join over the full
    // even-vs-odd∪planted corpora still runs whole.
    "sim_ann_join" -> ((s, d) => {
      val emb = embeddings(s, d).select("vec_id", "embedding")
      val left = emb.filter(col("vec_id") % 2 === 0)
      val planted = left.filter(col("vec_id") < 40)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val right = emb.filter(col("vec_id") % 2 === 1).unionByName(planted)
      Similarity.annJoin(left, right, minCosine = 0.2)
        .filter(col("right_id") === col("left_id") + 1000000L)
        .select(col("left_id"),
          (col("cosine") >= lit(0.999999)).as("twin_ok"))
        .orderBy("left_id")
    }),
    // ANN recall gates (r17 verdict #7, the 26ec pattern): ten query
    // ids answered by the approximate operator AND by exact brute
    // force over the same corpus; the emitted rows are the query ids
    // (hash-verified) with per-query and batch-mean recall floors as
    // booleans. Recall here is DETERMINISTIC (seeded hyperplanes,
    // disk-cached index), so the floors — set at ~half the minimum
    // measured on the sf corpora — are stable, and a real regression
    // (broken banding, mispruned cells) flips a flag and FAILS the
    // gate instead of hiding behind no_oracle.
    "sim_ann_lsh" -> ((s, d) => {
      val emb = embeddings(s, d)
      val qids = (0L until 10L).toSeq
      recallGate(Similarity.cosineTopKBatch(emb, qids, 10),
        Similarity.annLshBatch(emb, qids, 10),
        perQueryFloor = 0.1, meanFloor = 0.3)
    }),
    // stable per-dataset index path: the IVF index is an OFFLINE
    // artifact (fit once, query many) — keying it by the input's
    // content fingerprint (absolute path + newest parquet mtime, so
    // regenerated data at the same path invalidates the cache, and
    // distinct dirs can't collide the way a 32-bit hashCode could)
    // means repeated calls (bench rounds, verify) pay KMeans once and
    // then exercise only the partition-pruned query path
    "sim_ann_ivf" -> ((s, d) => {
      val emb = embeddings(s, d)
      val p = sys.props("java.io.tmpdir") + s"/graft_ivf_${datasetFingerprint(d)}"
      val index = if (new java.io.File(s"$p/centroids").exists()) Ivf.load(s, p)
                  else Ivf.fit(emb, p, 16)
      val qids = (0L until 10L).toSeq
      recallGate(Similarity.cosineTopKBatch(emb, qids, 10),
        Ivf.queryBatch(s, index, emb, qids, 10, 4),
        perQueryFloor = 0.2, meanFloor = 0.45)
    }),
    // PQ ANN: 8-byte codes (32x less scan I/O than the float32
    // embeddings), driver-side ADC lookup table, exact re-rank of the
    // shortlist. rows-only — codebooks aren't SQL-expressible;
    // AnnRecallSpec pins measured recall floors vs brute force
    "sim_pq" -> ((s, d) => {
      val emb = embeddings(s, d)
      Pq.query(emb, Pq.fit(emb))
    }),
    // IVF-PQ: the composed 100 TB serving shape — cell-partitioned
    // m-byte codes, partition-pruned ADC, exact re-rank. Index, codes
    // AND the PQ model persist under the dataset fingerprint (offline
    // artifacts, built once). The model is LOADED on the warm path,
    // never refit against persisted codes: refit "determinism" breaks
    // as soon as sampling kicks in (Pq.fit's df.sample is per-partition
    // Bernoulli — a different incoming partitioning yields a different
    // sample, different codebooks, and ADC distances silently
    // mismatched to the codes on disk)
    "sim_ann_ivfpq" -> ((s, d) => {
      val emb = embeddings(s, d)
      // "ivfpq2": the residual-encoding format (r8) — artifacts from
      // the raw-encoding era are invalid against lutResidual and must
      // not warm-load
      val path = sys.props("java.io.tmpdir") + s"/graft_ivfpq2_${datasetFingerprint(d)}"
      val (index, model) = Pq.loadOrBuildIvfPq(s, emb, path)
      // five queries, not ten: each IVFPQ query plans nprobe pruned
      // branches plus a re-rank join, so the batch plan grows fast —
      // five keeps the gate real at half the planning cost
      val qids = (0L until 5L).toSeq
      recallGate(Similarity.cosineTopKBatch(emb, qids, 10),
        Pq.ivfQueryBatch(s, index, model, emb, qids),
        perQueryFloor = 0.2, meanFloor = 0.45)
    }),
    // int8 embedding quantization: the quantized vector is pinned
    // oracle-exact through integer aggregates (sum/L1/min/max) — any
    // single-element disagreement shifts them
    "sim_quantize" -> ((s, d) => {
      import org.apache.spark.sql.functions.{abs, aggregate, array_max, array_min, lit, round}
      Similarity.quantizeInt8(embeddings(s, d))
        .select(
          col("vec_id"),
          round(col("q_scale"), 6).as("q_scale"),
          aggregate(col("qvec"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          aggregate(col("qvec"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
          array_min(col("qvec")).as("q_min"),
          array_max(col("qvec")).as("q_max"))
        .orderBy("vec_id")
    }),
    "text_langid" -> ((s, d) => TextOps.langId(documents(s, d))),
    "text_quality" -> ((s, d) => TextOps.quality(documents(s, d))),
    "text_tokens" -> ((s, d) => TextOps.tokens(documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprint(documents(s, d))),
    "text_redact" -> ((s, d) => TextOps.redact(documents(s, d))),
    "dedup_decontaminate" -> ((s, d) => {
      // stand-in blocklist: fingerprints of the 10 lowest-id docs
      val block = TextOps.fingerprint(documents(s, d))
        .filter(org.apache.spark.sql.functions.col("doc_id") < 10)
        .select(org.apache.spark.sql.functions.col("fp_md5").as("fp"))
      TextOps.decontaminate(documents(s, d), block)
    }),
    // n-gram-level decontamination: the benchmark is a verbatim
    // 13-word quote lifted from each of the first five (long-enough)
    // docs — exactly the embedded-eval-question case the whole-doc
    // fingerprint pass misses
    "dedup_decontaminate_ngram" -> ((s, d) => {
      import org.apache.spark.sql.functions.{concat_ws, size, slice, split}
      val docs = documents(s, d)
      val bench = docs
        .filter(col("doc_id") < 5 && size(split(col("text"), " ")) >= 15)
        .select(concat_ws(" ", slice(split(col("text"), " "), 3, 13)).as("text"))
      TextOps.decontaminateNgrams(docs, bench, n = 13)
        .select("doc_id").orderBy("doc_id")
    }),
    // per-eval-item contamination REPORT: five benchmark items lifted
    // verbatim from corpus docs (every gram leaks — overlap 1.0) plus
    // five clean items built from tokens the corpus cannot contain
    // (overlap 0.0); the gate checks the full quantification row-exact
    "decontaminate_report" -> ((s, d) => {
      import org.apache.spark.sql.functions.{concat, concat_ws, sequence, size, slice, split, transform}
      val docs = documents(s, d)
      val lifted = docs
        .filter(col("doc_id") < 5 && size(split(col("text"), " ")) >= 32)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(split(col("text"), " "), 3, 28)).as("text"))
      val clean = s.range(5).select(
        (col("id") + 100L).as("bench_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(20)),
          i => concat(lit("zz"), (col("id") + 100L).cast("string"),
            lit("_"), i.cast("string")))).as("text"))
      TextOps.decontaminationReport(docs, lifted.unionByName(clean), n = 13)
    }),
    "text_rollhash" -> ((s, d) => TextOps.rollhash(documents(s, d))),
    "text_repetition" -> ((s, d) => TextOps.repetition(documents(s, d))),
    // sketch stays in its exact regime here (31 distinct tokens <<
    // maxTracked), so the heavy-hitter output is exact group counts —
    // oracle-checkable; the approximation regime is spec'd
    "text_heavy_hitters" -> ((s, d) => TextOps.heavyHitters(documents(s, d))),
    "text_common_spans" -> ((s, d) => TextOps.commonSpans(documents(s, d))),
    // corpus-fit bigram LM quality score: the smoothed conditional
    // probabilities are plain count arithmetic, so the whole signal is
    // DuckDB-oracle-exact (per-term DECIMAL log sum — Det rationale)
    "text_lm_score" -> ((s, d) => TextOps.lmScore(documents(s, d))),
    "text_entropy" -> ((s, d) => TextOps.entropy(documents(s, d))),
    "text_boilerplate" -> ((s, d) => TextOps.stripBoilerplate(documents(s, d))),
    // BM25 ranked keyword search: one rare term ('dup', df≈25/500)
    // against two common ones — the idf spread is what the ranking
    // must get right; top-50 with doc_id tie-break
    "text_bm25" -> ((s, d) => TextOps.bm25(
      documents(s, d), Seq("dup", "vector", "join"), k = 50)),
    // the SERVING path over the persisted inverted index: same
    // statistics, same formula, same oracle as text_bm25 — but the
    // corpus explode ran once at build time (fingerprint-cached like
    // the ANN indexes) and the query scans only its buckets
    "text_bm25_indexed" -> ((s, d) => {
      val path = sys.props("java.io.tmpdir") +
        s"/graft_textidx_${datasetFingerprint(d, "documents.parquet")}"
      if (!new java.io.File(s"$path/stats").exists())
        TextOps.buildTextIndex(documents(s, d), path)
      TextOps.bm25Indexed(s, path, Seq("dup", "vector", "join"), k = 50)
    }),
    "text_vocab" -> ((s, d) => TextOps.vocab(documents(s, d))),
    // BPE tokenizer training over the corpus's own statistics: 10
    // merges from the word-frequency dictionary (rows-only: iterative
    // argmax isn't SQL-expressible; the hand-computed fixture spec and
    // the segment round-trip pin the algorithm)
    "text_bpe" -> ((s, d) => TextOps.bpeTrain(documents(s, d), numMerges = 10)),
    // JSONL ingest round trip with planted corruption: 200 docs export
    // to JSON lines, three malformed lines (bad syntax, type-violating
    // id, missing id) are appended, and the read-back GOOD side must be
    // exactly the 200 originals — the quarantine filtered the rest
    // (quarantine contents spec'd in SourcesSpec)
    // chat-template formatting: per-conversation ordered segments +
    // loss-mask spans, offsets computed inside a codegen'd aggregate
    "pack_chat" -> ((s, d) => {
      import org.apache.spark.sql.functions.explode
      val turns = events(s, d).select(col("user_id").as("conv_id"),
        col("ts"), col("event_id"), col("event_type"), col("props"))
      graft.operators.Packing.chatFormat(turns, "conv_id",
        Seq(col("ts"), col("event_id")), "event_type", "props",
        maskRoles = Set("purchase"))
        .select(col("conv").as("conv_id"), col("text"),
          explode(col("mask_spans")).as("span"))
        .select(col("conv_id"), col("text"),
          col("span.start").as("span_start"), col("span.end").as("span_end"))
        .orderBy("conv_id", "span_start")
    }),
    // HTML wrap → extract round trip: the extractor must hand back
    // exactly the prose that went into the markup (tags, script/style
    // blocks, comments, and entities all die on the way out)
    "text_html_extract" -> ((s, d) => {
      import org.apache.spark.sql.functions.concat
      val wrapped = documents(s, d).select(col("doc_id"),
        concat(lit("<html><head><style>p{color:red}</style></head><body>" +
          "<!-- boilerplate --><p>"), col("text"),
          lit("</p><script>var x = 1;</script></body></html>")).as("html"))
      graft.operators.TextOps.htmlExtract(wrapped)
        .select("doc_id", "text").orderBy("doc_id")
    }),
    // WARC round trip: the documents table writes as Common-Crawl-
    // style response records (HTTP block, Content-Length framing,
    // gzip members) and the distributed parser must hand back exactly
    // the original (doc_id, text) pairs — the gate proves byte-exact
    // framing, not just plausible parsing
    "ingest_warc" -> ((s, d) => {
      val dir = sys.props("java.io.tmpdir") + "/graft_warc_query"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      graft.sources.Warc.write(
        documents(s, d).select("doc_id", "text"), dir, compress = true)
      graft.sources.Warc.read(s, dir + "/*.warc.gz")
        .select(
          org.apache.spark.sql.functions.regexp_extract(
            col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
          col("payload").as("text"))
        .orderBy("doc_id")
    }),
    "ingest_jsonl" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{length, struct, to_json}
      val path = sys.props("java.io.tmpdir") + "/graft_jsonl_query"
      val docs = documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("source"), col("text"))
      val corrupt = Seq(
        "{ not json",
        """{"doc_id":"not_a_number","source":"web","text":"type-violating id"}""",
        """{"source":"web","text":"missing id"}""").toDF("value")
      docs.select(to_json(struct(col("doc_id"), col("source"), col("text")))
          .as("value"))
        .unionAll(corrupt)
        .write.mode("overwrite").text(path)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, text STRING")
      val (good, _) = graft.sources.Jsonl.readJsonl(s, path, schema,
        required = Seq("doc_id"))
      good.select(col("doc_id"), col("source"), length(col("text")).as("n_chars"))
        .orderBy("doc_id")
    }),
    "mm_decode_meta" -> ((s, d) => Multimodal.decodeMeta(documents(s, d))),
    // REAL container parsing over crafted header bytes with known
    // dimensions: the fixture (below) is the same on both engines, so
    // the oracle states the ground-truth VALUES and Spark must derive
    // them from the bytes
    "mm_image_meta" -> ((s, d) => {
      import s.implicits._
      val fx = imageFixture.map { case (id, hex, _) => (id, hex) }.toDF("doc_id", "hex")
      Multimodal.imageMeta(
        fx.select(col("doc_id"), org.apache.spark.sql.functions.unhex(col("hex")).as("payload")))
    }),
    // audio sibling of mm_image_meta: WAV fmt-chunk-behind-JUNK and
    // FLAC 20-bit-packed STREAMINFO, ground-truth VALUES oracle
    "mm_audio_meta" -> ((s, d) => {
      import s.implicits._
      val fx = audioFixture.map { case (id, hex, _) => (id, hex) }.toDF("doc_id", "hex")
      Multimodal.audioMeta(
        fx.select(col("doc_id"), org.apache.spark.sql.functions.unhex(col("hex")).as("payload")))
    }),
    // video sibling of mm_image_meta/mm_audio_meta: MP4 box walk +
    // AVI RIFF walk over crafted container bytes, ground-truth VALUES
    // oracle
    "mm_video_meta" -> ((s, d) => {
      import s.implicits._
      val fx = videoFixture.map { case (id, hex, _) => (id, hex) }.toDF("doc_id", "hex")
      Multimodal.videoMeta(
        fx.select(col("doc_id"), org.apache.spark.sql.functions.unhex(col("hex")).as("payload")))
    }),
    // histogram flattened to 16 scalar columns: the driver's pandas
    // row-sort can't hash an array column (round-1 harness crash), and
    // scalar columns also make the op DuckDB-oracle-checkable
    "mm_features" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, round}
      val f = Multimodal.featureExtract(s, documents(s, d)).toDF()
      val histCols = (0 until 16).map(i => col("histogram")(i).as(s"h$i"))
      f.select(col("doc_id") +: histCols :+
        round(col("entropy"), 6).as("entropy") :+
        col("resized_w") :+ col("resized_h"): _*)
        .orderBy("doc_id")
    }),
    "mm_framesample" -> ((s, d) => Multimodal.frameSample(documents(s, d))),
    // exact deterministic stratified sample: 25% per text-length-mod-4
    // stratum, md5-of-id order — reproducible and DuckDB-oracle-exact
    "sample_stratified" -> ((s, d) => Sampling.stratified(
      documents(s, d).select("doc_id", "text"),
      pmod(length(col("text")), lit(4)), frac = 0.25)
      .select("doc_id", "stratum").orderBy("doc_id")),
    // data-mix sampling: per-stratum fractions (0.5/0.25/drop/default
    // 0.125 — all exact in binary AND decimal, see sample_stratified)
    "sample_weighted" -> ((s, d) => Sampling.weighted(
      documents(s, d).select("doc_id", "text"),
      pmod(length(col("text")), lit(4)),
      fracs = Map("0" -> 0.5, "1" -> 0.25, "2" -> 0.0),
      defaultFrac = 0.125)
      .select("doc_id", "stratum").orderBy("doc_id")),
    // temperature-based mixture sampling: alpha=0.5 (sqrt — correctly
    // rounded in IEEE, so the floor/remainder quota arithmetic is
    // bit-identical in DuckDB), 1000-row budget over the event domains
    "sample_temperature" -> ((s, d) => Sampling.temperature(
      events(s, d).select("event_id", "event_type"),
      col("event_type"), alpha = 0.5, targetN = 1000, idCol = "event_id")
      .select("event_id", "domain").orderBy("event_id")),
    // token-budget sampling: 800 whitespace-tokens per source, greedy
    // md5-order prefix — integer running sums, oracle-exact
    // explicit mixture weights + repetition-capped up-sampling: the
    // llama-style recipe step; weights chosen binary-exact (0.25/0.125)
    // so the double arithmetic is bit-identical on both engines
    "sample_mixture" -> ((s, d) => Sampling.mixture(
      documents(s, d).select("doc_id", "lang", "n_chars"),
      col("lang"), col("n_chars"),
      Map("en" -> 0.25, "de" -> 0.25, "es" -> 0.25,
        "fr" -> 0.125, "zh" -> 0.125),
      budget = 120000L, maxRepeat = 4)
      .select(col("doc_id"), col("domain"), col("epoch"), col("cum_tokens"))
      .orderBy("domain", "epoch", "doc_id")),
    "sample_token_budget" -> ((s, d) => Sampling.tokenBudget(
      documents(s, d).select("doc_id", "source", "text"),
      col("source"), size(split(col("text"), " ")), budget = 800)
      .select("doc_id", "domain", "cum_tokens").orderBy("doc_id")),
    // GPT-style concat-and-chunk packing: global token offsets via the
    // distributed prefix scan, sequences of 2048 tokens
    "pack_sequences" -> ((s, d) => Packing.packSequences(
      documents(s, d), size(split(col("text"), " ")), budget = 2048)
      .select(col("doc_id"), col("n_tokens"),
        col("offset").as("tok_offset"), col("seq_id"))
      .orderBy("doc_id")),
    // length-bucketed batching: 16-token-wide buckets, batches of 8 —
    // the batch SUMMARY (count/seqlen/padding waste) is the checkable
    // surface, and batch membership is the portable md5 permutation
    "pack_length_batch" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count, lit, max, sum}
      Packing.lengthBuckets(documents(s, d), size(split(col("text"), " ")),
        bucketWidth = 16, batchSize = 8)
        .groupBy("bucket", "batch_in_bucket")
        .agg(count(lit(1)).as("n_docs"), max("n_tokens").as("batch_seqlen"),
          sum("n_tokens").as("sum_tokens"))
        .withColumn("pad_waste",
          col("n_docs") * col("batch_seqlen") - col("sum_tokens"))
        .orderBy("bucket", "batch_in_bucket")
    }),
    // per-epoch deterministic corpus shuffle: dense permuted position
    // via bucketed rank — never a single-reducer global row_number
    "shuffle_deterministic" -> ((s, d) => Sampling.deterministicShuffle(
      documents(s, d).select("doc_id"), salt = "epoch1")
      .select("doc_id", "shuffle_key", "shuffle_pos").orderBy("doc_id")),
    // end-to-end near-dup removal: LSH candidates -> jaccard verify ->
    // components -> min-id survivors (rows-only: minhash internals)
    "dedup_sweep" -> ((s, d) => Dedup.sweep(documents(s, d))),
    // URL canonicalization over a crafted variant fixture: casing,
    // tracking params, default ports, www, fragments, trailing slash —
    // the canonical form must come out of the regex chain; the oracle
    // states ground truth (VALUES, the mm_* pattern — a DuckDB regex
    // re-derivation would test dialect parity, not the operator)
    // global line-level exact dedup (the CommonCrawl boilerplate-line
    // pass): the corpus has no newlines, so both engines derive the
    // SAME deterministic multi-line form first — tokens regrouped 8 to
    // a line — then every line keeps only its globally-first
    // occurrence and docs reassemble from the survivors
    "dedup_lines" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nl = floor((size(toks) + lit(7)) / lit(8)).cast("int")
      val lined = documents(s, d).select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), nl - lit(1)),
            j => array_join(slice(toks, j * lit(8) + lit(1), lit(8)), " ")),
          "\n").as("text"))
      Dedup.dedupLines(lined).orderBy("doc_id")
    }),
    // EXACT repeated-substring dedup (Lee et al.): 30 planted copies
    // (prefix + verbatim corpus text under new ids) guarantee shared
    // ≥20-token spans; every span is cut from the LATER doc, original
    // and singleton text pass through verbatim. Oracle-exact: the SQL
    // twin matches windows by CONTENT where Spark matches by the
    // window's 64-bit hash — identical semantics, collision-free at
    // this scale
    "dedup_spans" -> ((s, d) => {
      import org.apache.spark.sql.functions.concat
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(lit("planted copy marker "), col("text")).as("text"))
      Dedup.removeRepeatedSpans(docs.unionByName(planted), k = 20)
        .orderBy("doc_id")
    }),
    // END-TO-END curation funnel: quality gate → exact dedup → pack,
    // reported as a per-stage (docs, tokens) funnel — the composition
    // query that shows the operators chaining into a real pipeline,
    // with every stage's counts independently SQL-derivable
    "curation_sweep" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count, countDistinct, sum}
      val docs = documents(s, d)
      val toks = size(split(col("text"), " "))
      val withTok = docs.select(col("doc_id"), col("text"), toks.as("n_tokens"))
      // eager cuts: `gated` feeds its own stage row, the dedup AND the
      // dedup join-back (the quality pass re-ran 3x lazily); `deduped`
      // feeds its stage row and the packer (guide §5)
      val gated = graft.operators.Checkpoints.cut(withTok
        .join(TextOps.quality(docs).select("doc_id", "n_words"), "doc_id")
        .filter(col("n_words") >= 56)
        .select("doc_id", "text", "n_tokens"))
      val survivors = Dedup.exact(gated)
        .select(col("keep_id").as("doc_id"))
      val deduped = graft.operators.Checkpoints.cut(gated.join(survivors, "doc_id"))
      val packed = graft.operators.Packing.packSequences(
        deduped, col("n_tokens"), budget = 256)
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      stage("1_raw", withTok)
        .unionAll(stage("2_quality", gated))
        .unionAll(stage("3_dedup", deduped))
        .unionAll(packed.agg(
          countDistinct(col("seq_id")).as("n_docs"),
          sum("n_tokens").as("n_tokens"))
          .select(lit("4_packed").as("stage"), col("n_docs"), col("n_tokens")))
        .orderBy("stage")
    }),
    // EXACT Jaccard similarity join via prefix filtering (PPJoin-lite)
    // over the DISTINCT part-name token sets (the dedup_edit blocking
    // rationale: the name domain is vocab-bounded while id-level pairs
    // grow quadratically). Every pair >= 0.3 must surface — the oracle
    // computes the unfiltered token-join ground truth.
    "dedup_jaccard_join" -> ((s, d) => {
      val names = part(s, d).select(col("p_name")).distinct()
        .select(col("p_name").as("doc_id"), col("p_name").as("text"))
      Dedup.jaccardJoin(names, threshold = 0.3)
        .withColumnRenamed("doc_a", "name_a")
        .withColumnRenamed("doc_b", "name_b")
        .orderBy("name_a", "name_b")
    }),
    // feature hashing: fixed-dim token-count features with no
    // vocabulary pass, emitted in sparse COO form (doc, bucket, n) —
    // the md5-prefix bucket parses identically in both engines
    "text_feature_hash" -> ((s, d) =>
      TextOps.featureHash(documents(s, d), dim = 16)
        .orderBy("doc_id", "bucket")),
    // weight-proportional sampling without replacement
    // (Efraimidis–Spirakis keys off deterministic md5 uniforms):
    // longer docs win proportionally more of the 100 slots
    "sample_prop" -> ((s, d) =>
      graft.operators.Sampling.weightProportional(
        documents(s, d).select("doc_id", "n_chars"),
        col("n_chars"), k = 100)),
    // fixed-k uniform sample per group (salted md5 draw, the
    // TopKPerGroup physical operator): 5 docs from each of 7
    // synthetic sources, reproducible bit-for-bit on both engines
    "sample_per_group" -> ((s, d) =>
      graft.operators.Sampling.perGroupK(
        documents(s, d).select(col("doc_id"),
          pmod(col("doc_id"), lit(7)).cast("int").as("grp")),
        col("grp"), k = 5)
        .select("grp", "doc_id").orderBy("grp", "doc_id")),
    "dedup_url" -> ((s, d) => {
      import s.implicits._
      val fx = urlFixture.map { case (id, raw, _) => (id, raw) }.toDF("doc_id", "url")
      fx.select(col("doc_id"),
        graft.operators.Dedup.canonicalUrl(col("url")).as("url_canon"))
        .orderBy("doc_id")
    }),
    // PageRank over a planted 100-node cycle — a REGULAR graph, so the
    // uniform distribution is the EXACT fixed point and stays invariant
    // under every power iteration (each node receives exactly one
    // full rank share): the distributed loop (per-round contribution
    // join + dangling-mass fold) must reproduce 1/N per node to 6
    // decimals after 5 real rounds, and the oracle states the closed
    // form — the dedup_components planted-oracle pattern for an
    // ITERATIVE float algorithm. Non-uniform convergence (star graph,
    // dangling nodes) is spec'd with hand-solved fixed points.
    // triangle counting on the co-purchase graph (parts sharing an
    // order): degree-oriented wedge enumeration in Spark, naive
    // id-ordered 3-way self-join in DuckDB — the triangle SET is
    // orientation-invariant, so the per-node counts must hash-match
    // exactly. Support ≥2 (parts co-bought in at least two orders)
    // sparsifies the random co-occurrence flood — the raw graph at
    // sf0.1 has 1.2M edges and a 28 s wedge phase; the repeat-purchase
    // graph has ~3.5k edges at any sf, and the support aggregation is
    // the same single (u,v) shuffle that built the edge set anyway.
    // Top-20 by (count desc, node).
    "graph_triangles" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count, desc, lit}
      val items = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = items.as("a")
        .join(items.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
        .agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
        .drop("sup")
      graft.operators.Graph.triangles(edges)
        .orderBy(desc("n_triangles"), col("node"))
        .limit(20)
    }),
    // overlapping token-window chunking, oracle-exact: both engines
    // compute the same start-multiples-of-stride + tail-kept-once rule
    "text_chunk" -> ((s, d) => TextOps.chunk(documents(s, d))),
    // blocked Levenshtein near-dup over part names (block = first
    // token, the color word): record-linkage on short strings,
    // oracle-exact — DuckDB and Spark both implement classic
    // unit-cost edit distance. Compared on DISTINCT names (the
    // standard linkage trick): the name domain is vocab-bounded (64
    // at every sf) while id-level pairs grow quadratically with the
    // rows sharing a name — 25M comparisons and a multi-million-row
    // answer at sf0.1. Joining matched names back to ids is a cheap
    // follow-up equi-join users compose themselves.
    "dedup_edit" -> ((s, d) => Dedup.editPairs(
      part(s, d).select(col("p_name")).distinct()
        .select(col("p_name").as("id"), col("p_name").as("name")),
      blockKey = element_at(split(col("name"), " "), 1),
      maxDist = 4, textCol = "name")
      .withColumnRenamed("id_a", "name_a").withColumnRenamed("id_b", "name_b")),
    // PCA projection of the embedding corpus to 4 dims (rows-only:
    // eigensolve isn't SQL-expressible; PcaSpec pins orthonormality,
    // planted-rank recovery, partitioning-independence). Decimal-exact
    // moment sums make the model — and so this output — deterministic.
    "emb_pca" -> ((s, d) => {
      val emb = embeddings(s, d)
      val m = graft.operators.Embeddings.pcaFitCached(emb, k = 4,
        cacheKey = datasetFingerprint(d))
      graft.operators.Embeddings.pcaProject(emb, m)
        .select(col("vec_id"),
          round(element_at(col("proj"), 1), 6).as("pc0"),
          round(element_at(col("proj"), 2), 6).as("pc1"),
          round(element_at(col("proj"), 3), 6).as("pc2"),
          round(element_at(col("proj"), 4), 6).as("pc3"))
        .orderBy("vec_id")
    }),
    // hybrid retrieval: BM25 keyword ranks fused with ANN cosine ranks
    // by reciprocal-rank fusion in INTEGER arithmetic (scale div
    // (k0+rank)) — the fused score is exact on any engine. Both input
    // lists are bounded top-50s; the single-partition rank windows run
    // on ≤50 rows (post-limit), never the corpus.
    "text_hybrid_search" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{desc, row_number}
      val bm = TextOps.bm25(documents(s, d), Seq("dup", "vector", "join"), k = 50)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(desc("score"), col("doc_id"))).as("r"))
      val cos = Similarity.cosineTopK(embeddings(s, d), k = 50)
        .select(col("vec_id").as("doc_id"),
          row_number().over(Window.orderBy(desc("cosine"), col("vec_id"))).as("r"))
      graft.operators.Search.rrfFuse(Seq("bm25" -> bm, "cosine" -> cos))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(20)
    }),
    "graph_pagerank" -> ((s, d) => {
      val edges = s.range(100)
        .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
      graft.operators.Graph.pagerank(edges, iterations = 5)
        .select(col("node"), org.apache.spark.sql.functions.round(col("pr"), 6).as("pr"))
        .orderBy("node")
    }),
    // k-core on a planted graph with a closed-form answer: a 10-clique
    // (every node degree 9) bridged to a 30-node chain (degrees ≤ 2).
    // At k=3 the REAL iterative peeling must dissolve the chain end-in
    // (≈15 rounds — the worst case, each round only exposes the next
    // node) and then drop the bridge, leaving exactly the clique with
    // its internal degrees; the oracle states the closed form.
    "graph_kcore" -> ((s, d) => {
      val clique = s.range(9)
        .select(col("id").as("src"),
          explode(sequence(col("id") + 1, lit(9))).as("dst"))
      val chain = s.range(29)
        .select((col("id") + 100).as("src"), (col("id") + 101).as("dst"))
      val bridge = s.range(1)
        .select(lit(0L).as("src"), lit(100L).as("dst"))
      graft.operators.Graph.kcore(
        clique.unionAll(chain).unionAll(bridge), k = 3)
        .orderBy("node")
    }),
    // hierarchy flattening vs a genuine RECURSIVE CTE oracle: a
    // 127-node binary tree (parent = (i-1)/2) resolved to
    // (node, root, depth) by O(log depth) pointer-doubling rounds —
    // DuckDB walks it row-recursively, the distributed plan must land
    // on the identical closure
    "graph_hierarchy" -> ((s, d) => {
      val nodes = s.range(127).select(
        col("id").as("node"),
        when(col("id") === 0, lit(null).cast("long"))
          .otherwise(floor((col("id") - 1) / lit(2)).cast("long")).as("parent"))
      graft.operators.Graph.flattenHierarchy(nodes).orderBy("node")
    }),
    // connected components over a planted chain graph: 20 chains of 50
    // nodes, generated identically on both engines, ground truth
    // analytic (component = id - id % 50). The ITERATIVE min-label +
    // pointer-jump algorithm runs for real — chains of 50 are its
    // worst case (max diameter), cliques its best — while the oracle
    // states the closed form, making the distributed loop hash-exact
    // checkable in DuckDB without recursion.
    // leakage-safe K-FOLD CV assignment over the planted chain graph:
    // closed-form clusters + the portable md5-prefix fold hash make
    // the whole rule — including the real components run — oracle-exact
    "split_kfold" -> ((s, d) => {
      import org.apache.spark.sql.functions.pmod
      val chain = 50L
      val pairs = s.range(999)
        .filter(pmod(col("id"), lit(chain)) =!= lit(chain - 1))
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val docs = s.range(1000).select(col("id").as("doc_id"))
      Dedup.kfoldSplit(docs, pairs, k = 5).orderBy("doc_id")
    }),
    // survivor election by QUALITY over the planted chain graph:
    // clusters are the closed-form components, quality is the
    // engine-portable (id·37) mod 101, so the whole keep-best rule —
    // including the real distributed components run — is oracle-exact
    "dedup_keep_best" -> ((s, d) => {
      import org.apache.spark.sql.functions.pmod
      val chain = 50L
      val pairs = s.range(999)
        .filter(pmod(col("id"), lit(chain)) =!= lit(chain - 1))
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val quality = s.range(1000)
        .select(col("id").as("doc_id"), ((col("id") * 37) % 101).as("quality"))
      Dedup.electBest(pairs, quality).orderBy("component")
    }),
    "dedup_components" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val chain = 50L
      val pairs = s.range(999)
        .filter(pmod(col("id"), lit(chain)) =!= lit(chain - 1))
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      Dedup.components(pairs).orderBy("doc_id")
    }),
    // leakage-safe split over the same planted chain graph: the cluster
    // assignment is the oracle-exact closed form and the split rule is
    // a portable md5-prefix comparison, so the WHOLE operator is
    // DuckDB-checkable — including that clusters never straddle splits
    "split_leakage_safe" -> ((s, d) => {
      val chain = 50L
      val pairs = s.range(999)
        .filter(pmod(col("id"), lit(chain)) =!= lit(chain - 1))
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val docs = s.range(1000).select(col("id").as("doc_id"))
      Dedup.leakageSafeSplit(docs, pairs, valFrac = 0.25).orderBy("doc_id")
    }),
  )

  /** Hex of a minimal well-formed PNG prefix: signature + IHDR with the
    * given dims (bit depth/color/CRC bytes present but arbitrary). */
  private[graft] def pngHex(w: Int, h: Int): String =
    "89504E470D0A1A0A" + "0000000D" + "49484452" +
      f"$w%08X" + f"$h%08X" + "0806000000" + "00000000"

  /** Hex of a minimal JFIF JPEG: SOI, APP0, a quantization table, SOF0
    * with the given dims, EOI — the SOF sits BEHIND variable segments,
    * so only a real segment walk finds it. */
  private[graft] def jpegHex(w: Int, h: Int): String =
    "FFD8" +
      "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0001" + "0001" + "00" + "00" +
      "FFDB" + "0005" + "001122" +
      "FFC0" + "000B" + "08" + f"$h%04X" + f"$w%04X" + "011100" +
      "FFD9"

  /** Hex of a GIF87a prefix: dims are LITTLE-endian u16. */
  private[graft] def gifHex(w: Int, h: Int): String = {
    def le16(v: Int) = f"${v & 0xff}%02X" + f"${(v >> 8) & 0xff}%02X"
    "474946383761" + le16(w) + le16(h) + "F700" + "3B"
  }

  /** (doc_id, payload hex, expected (format, w, h) or None-for-corrupt)
    * — shared by the mm_image_meta entry and its VALUES oracle. */
  private[graft] def imageFixture: Seq[(Long, String, Option[(String, Int, Int)])] =
    (0 until 12).map { i =>
      val w = 100 + 13 * i
      val h = 50 + 7 * i
      i % 4 match {
        case 0 => (i.toLong, pngHex(w, h), Some(("png", w, h)))
        case 1 => (i.toLong, jpegHex(w, h), Some(("jpeg", w, h)))
        case 2 => (i.toLong, gifHex(w, h), Some(("gif", w, h)))
        case _ => (i.toLong, "DEADBEEF", None)
      }
    }

  /** Hex of a minimal WAV whose "fmt " chunk sits BEHIND a JUNK chunk —
    * only a real chunk walk finds it. */
  private[graft] def wavHex(sr: Int, ch: Int, bits: Int): String = {
    def le16(v: Int) = f"${v & 0xff}%02X" + f"${(v >> 8) & 0xff}%02X"
    def le32(v: Int) = le16(v & 0xffff) + le16((v >>> 16) & 0xffff)
    "52494646" + le32(100) + "57415645" +
      "4A554E4B" + le32(4) + "00000000" +
      "666D7420" + le32(16) + le16(1) + le16(ch) + le32(sr) +
      le32(sr * ch * (bits / 8)) + le16(ch * (bits / 8)) + le16(bits)
  }

  /** Hex of a minimal FLAC: "fLaC" + a last-block STREAMINFO with the
    * 20-bit sample rate / 3-bit channels / 5-bit bps packing. */
  private[graft] def flacHex(sr: Int, ch: Int, bits: Int): String = {
    def b(v: Int) = f"${v & 0xff}%02X"
    "664C6143" + "80000022" +
      "1000" + "1000" + "000000" + "000000" +
      b(sr >> 12) + b(sr >> 4) +
      b(((sr & 0xf) << 4) | ((ch - 1) << 1) | (((bits - 1) >> 4) & 1)) +
      b(((bits - 1) & 0xf) << 4) + "00000000" + ("00" * 16)
  }

  /** (doc_id, payload hex, expected (format, sr, ch, bits) or
    * None-for-corrupt) — shared by mm_audio_meta and its oracle. */
  private[graft] def audioFixture: Seq[(Long, String, Option[(String, Int, Int, Int)])] =
    (0 until 10).map { i =>
      val sr = 8000 + 4410 * i
      val ch = 1 + i % 3
      val bits = 8 * (1 + i % 4)
      i % 4 match {
        case 0 | 2 => (i.toLong, wavHex(sr, ch, bits), Some(("wav", sr, ch, bits)))
        case 1     => (i.toLong, flacHex(sr, ch, bits), Some(("flac", sr, ch, bits)))
        // truncated RIFF prefix and plain garbage must both null out
        case _ if i == 3 => (i.toLong, "52494646AABB", None)
        case _           => (i.toLong, "DEADBEEF", None)
      }
    }

  /** (doc_id, raw url, expected canonical) — shared by dedup_url and
    * its VALUES oracle; ids 6/7 collapse to one canonical form. */
  private[graft] def urlFixture: Seq[(Long, String, String)] = Seq(
    (0L, "HTTPS://Example.COM/Path/Item?b=2&utm_source=x#frag",
      "https://example.com/Path/Item?b=2"),
    (1L, "http://example.com:80/a/", "http://example.com/a"),
    (2L, "https://www.example.com:443/a?utm_a=1&utm_b=2", "https://example.com/a"),
    (3L, "http://Sub.Example.com/A?fbclid=abc&x=1", "http://sub.example.com/A?x=1"),
    (4L, "https://example.com/a?x=1&gclid=z", "https://example.com/a?x=1"),
    (5L, "https://example.com/", "https://example.com"),
    (6L, "https://EXAMPLE.com/p?utm_c=3", "https://example.com/p"),
    (7L, "https://example.com/p", "https://example.com/p"),
    // scheme-aware ports: :443 on http is NOT default and must survive
    (8L, "http://example.com:443/a", "http://example.com:443/a"),
    (9L, "not a url at all", "not a url at all"))

  /** Hex of a minimal MP4: ftyp + a free box, then moov whose mvhd sits
    * BEHIND a udta child and whose trak>tkhd carries 16.16 fixed-point
    * dims — only a real two-level box walk finds all of it. */
  private[graft] def mp4Hex(w: Int, h: Int, timescale: Long, duration: Long): String = {
    def be32(v: Long) = f"${v & 0xffffffffL}%08X"
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
    val free = "0000000C" + "66726565" + "DEADBEEF"
    val mvhd = be32(28) + "6D766864" + "00000000" + "00000000" + "00000000" +
      be32(timescale) + be32(duration)
    val tkhd = be32(92) + "746B6864" + "00000000" + ("00" * 72) +
      be32(w.toLong << 16) + be32(h.toLong << 16)
    val trak = be32(100) + "7472616B" + tkhd
    val udta = "00000008" + "75647461"
    val moovPayload = udta + mvhd + trak
    ftyp + free + be32(8L + moovPayload.length / 2) + "6D6F6F76" + moovPayload
  }

  /** Hex of a minimal AVI: RIFF/AVI with a JUNK chunk before LIST/hdrl,
    * avih carrying µs-per-frame, frame count, and dims. */
  private[graft] def aviHex(w: Int, h: Int, uspf: Long, frames: Long): String = {
    def le32(v: Long) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X" +
      f"${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
    val avih = "61766968" + le32(56) + le32(uspf) + le32(0) + le32(0) + le32(0) +
      le32(frames) + le32(0) + le32(1) + le32(0) + le32(w.toLong) + le32(h.toLong) +
      ("00" * 16)
    val list = "4C495354" + le32(4L + avih.length / 2) + "6864726C" + avih
    val junk = "4A554E4B" + le32(4) + "00000000"
    val payload = junk + list
    "52494646" + le32(4L + payload.length / 2) + "41564920" + payload
  }

  /** (doc_id, payload hex, expected (format, w, h, duration_ms) or
    * None-for-corrupt) — shared by mm_video_meta and its oracle. */
  private[graft] def videoFixture: Seq[(Long, String, Option[(String, Int, Int, Long)])] =
    (0 until 10).map { i =>
      val w = 320 + 16 * i
      val h = 180 + 9 * i
      i % 4 match {
        case 0 | 2 =>
          val ts = 600L + 100 * i; val dur = 3000L + 777 * i
          (i.toLong, mp4Hex(w, h, ts, dur), Some(("mp4", w, h, dur * 1000L / ts)))
        case 1 =>
          val uspf = 33333L + i; val frames = 240L + 24 * i
          (i.toLong, aviHex(w, h, uspf, frames),
            Some(("avi", w, h, frames * uspf / 1000L)))
        // a truncated ftyp prefix and plain garbage must both null out
        case _ if i == 3 => (i.toLong, "000000106674797069736F6D", None)
        case _           => (i.toLong, "DEADBEEF", None)
      }
    }

  /** Cache key for per-dataset offline artifacts: SHA-256 over the
    * dataset's absolute path plus the newest modification time under
    * the source table (embeddings for the ANN indexes, documents for
    * the text index), truncated to 16 hex chars. */
  /** Recall-gate rows for an ANN result: one row per query id with a
    * per-query floor and the batch-mean floor as booleans — the ids
    * hash-verify, the flags carry the geometry (the 26ec pattern).
    * Measured per-corpus minima (deterministic — seeded hyperplanes /
    * disk-cached index): LSH 0.2, IVF 0.4, IVFPQ 0.3 per query; means
    * 0.46-0.75. Floors sit at ~half those, so a pass is stable across
    * the sf corpora and only a real regression flips a flag. */
  private def recallGate(exact: DataFrame, approx: DataFrame,
                         perQueryFloor: Double, meanFloor: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.avg
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // coalesce(1): the gate is ≤|Q| rows and the unpartitioned window
    // needs AllTuples anyway — a one-partition narrow coalesce
    // satisfies it (and the final sort) without the single-partition
    // Exchange stage the bare window planned (guide §2.4)
    Similarity.recallAtK(exact, approx)
      .coalesce(1)
      .select(col("qid"),
        (col("recall") >= lit(perQueryFloor)).as("per_query_ok"),
        (avg(col("recall")).over(w) >= lit(meanFloor)).as("mean_ok"))
      .orderBy("qid")
  }

  private[graft] def datasetFingerprint(
      d: String, table: String = "embeddings.parquet"): String = {
    val root = new java.io.File(d, table)
    def newest(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified +: Option(f.listFiles()).getOrElse(Array.empty).map(newest).toSeq).max
      else f.lastModified
    val seed = s"${root.getAbsolutePath}@${newest(root)}"
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(seed.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  // same BM25 formula, spelled as the identical IEEE expression —
  // constants appear as the same source arithmetic ((1.2 + 1.0), not
  // 2.2: parsed-literal vs computed-sum doubles can differ one ulp),
  // and each term contribution rounds through DECIMAL(18,6) before
  // the per-doc sum, the lmScore pattern. Shared by text_bm25 and
  // text_bm25_indexed: the index changes the execution strategy, not
  // one bit of the answer.
  private val bm25OracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |         CAST(SUM(CAST(len(t) AS DECIMAL(18,6))) AS DOUBLE) AS sdl
      |  FROM toks),
      |tf AS (
      |  SELECT doc_id, CAST(len(t) AS INT) AS dl, u.term, count(*) AS tf
      |  FROM toks, UNNEST(t) AS u(term)
      |  WHERE u.term IN ('dup', 'vector', 'join')
      |  GROUP BY 1, 2, 3),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      |SELECT tf.doc_id, count(*) AS n_terms,
      |  CAST(SUM(CAST(
      |    ln((n - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * (1.2 + 1.0))
      |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n)))
      |    AS DECIMAL(18,6))) AS DOUBLE) AS score
      |FROM tf JOIN df USING (term) CROSS JOIN stats
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin

  /** Portable spelling of TextOps.occ for the DuckDB side. */
  private def occSql(text: String, sub: String): String =
    s"CAST((length($text) - length(replace($text, '$sub', ''))) / ${sub.length} AS INT)"

  private val pt = "' ' || text || ' '"

  val oracles: Map[String, String] = Map(
    // the polynomial rolling hash is deterministic integer arithmetic:
    // DuckDB replays h = h*1315423911 + byte with 64-bit wraparound via
    // HUGEINT mod 2^64, then maps back to the signed BIGINT Spark
    // returns. Byte access rides ascii() per character — exact because
    // the synthetic corpus is pure ASCII (verified: octet_length =
    // length for every row), where UTF-8 bytes ≡ code units.
    "text_rollhash" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         list_transform(string_split(lower(text), ''),
        |                        c -> ascii(c)) AS bytes
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |            THEN h - 18446744073709551616::HUGEINT
        |            ELSE h END AS BIGINT) AS fp64
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(0::HUGEINT, bytes),
        |      (acc, x) -> (acc * 1315423911 + x)
        |                  % 18446744073709551616::HUGEINT) AS h
        |  FROM b
        |) ORDER BY doc_id""".stripMargin,
    // the gate admits EXACTLY the novel half of the planted batch:
    // re-presents are guaranteed rejections (jaccard 1.0), novel docs
    // guaranteed admissions (corpus shares none of their tokens)
    "dedup_incremental_gate" ->
      """SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id
        |FROM documents WHERE doc_id < 5 ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, sha256(text) AS h
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin,
    // planted-coverage gates (r18): verbatim twins are GUARANTEED
    // candidates (identical signature/fingerprint/shingles match every
    // band), so the coverage rows — and the exact hamming-0 /
    // jaccard-1.0 columns — replay deterministically
    "dedup_minhash" ->
      """SELECT doc_id, true AS planted_caught
        |FROM documents WHERE doc_id < 10 ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      """SELECT doc_id, CAST(0 AS INTEGER) AS hamming
        |FROM documents WHERE doc_id < 10 ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """SELECT doc_id, CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents WHERE doc_id < 10 ORDER BY doc_id""".stripMargin,
    "sim_ann_join" ->
      """SELECT vec_id AS left_id, true AS twin_ok
        |FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 40
        |ORDER BY left_id""".stripMargin,
    // ANN recall gates: the ids replay exactly; the flags assert the
    // in-query recall floors (deterministic — seeded planes, cached
    // index) and must all read true
    "sim_ann_lsh" ->
      """SELECT vec_id AS qid, true AS per_query_ok, true AS mean_ok
        |FROM embeddings WHERE vec_id < 10 ORDER BY qid""".stripMargin,
    "sim_ann_ivf" ->
      """SELECT vec_id AS qid, true AS per_query_ok, true AS mean_ok
        |FROM embeddings WHERE vec_id < 10 ORDER BY qid""".stripMargin,
    "sim_ann_ivfpq" ->
      """SELECT vec_id AS qid, true AS per_query_ok, true AS mean_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY qid""".stripMargin,
    // repeated-substring dedup: the SQL twin matches 20-token windows
    // by CONTENT (Spark matches their xxhash64 — same semantics,
    // collision-free at this scale); keeper = min doc_id, every
    // non-keeper occurrence cuts its covered token positions, affected
    // docs rebuild from survivors, the rest pass through verbatim
    "dedup_spans" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000, 'planted copy marker ' || text
        |  FROM documents WHERE doc_id < 30),
        |t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM src),
        |g AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
        |         array_to_string(list_slice(toks, CAST(u.i AS BIGINT) + 1,
        |                                    CAST(u.i AS BIGINT) + 20), ' ') AS w
        |  FROM t, UNNEST(range(0, n - 19)) AS u(i)
        |  WHERE n >= 20),
        |own AS (
        |  SELECT w, min(doc_id) AS keeper FROM g GROUP BY w
        |  HAVING min(doc_id) <> max(doc_id)),
        |cov AS (
        |  SELECT DISTINCT g.doc_id, g.pos + CAST(u.j AS BIGINT) AS idx
        |  FROM g JOIN own ON g.w = own.w AND g.doc_id <> own.keeper,
        |       UNNEST(range(0, 20)) AS u(j)),
        |aff AS (SELECT DISTINCT doc_id FROM cov),
        |kept AS (
        |  SELECT t.doc_id, CAST(u.i AS BIGINT) AS idx,
        |         list_extract(t.toks, CAST(u.i AS BIGINT) + 1) AS tok
        |  FROM t, UNNEST(range(0, n)) AS u(i)
        |  WHERE t.doc_id IN (SELECT doc_id FROM aff)
        |    AND NOT EXISTS (SELECT 1 FROM cov
        |                    WHERE cov.doc_id = t.doc_id
        |                      AND cov.idx = CAST(u.i AS BIGINT))),
        |reb AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text,
        |         CAST(count(*) AS BIGINT) AS kept_n
        |  FROM kept GROUP BY doc_id)
        |SELECT doc_id, text, CAST(0 AS BIGINT) AS removed_tokens
        |FROM src WHERE doc_id NOT IN (SELECT doc_id FROM aff)
        |UNION ALL
        |SELECT a.doc_id, coalesce(r.text, '') AS text,
        |       t2.n - coalesce(r.kept_n, 0) AS removed_tokens
        |FROM aff a JOIN t t2 USING (doc_id) LEFT JOIN reb r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "sim_cosine_topk" ->
      """SELECT vec_id,
        |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,
    "text_langid" -> {
      val en = s"${occSql(pt, " the ")} + ${occSql(pt, " a ")}"
      val es = s"${occSql(pt, " el ")} + ${occSql(pt, " la ")}"
      val de = s"${occSql(pt, " der ")} + ${occSql(pt, " und ")}"
      val fr = s"${occSql(pt, " le ")} + ${occSql(pt, " et ")}"
      s"""WITH h AS (
         |  SELECT doc_id, $en AS en_hits, $es AS es_hits,
         |         $de AS de_hits, $fr AS fr_hits
         |  FROM documents)
         |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
         |       WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
         |       WHEN de_hits >= fr_hits THEN 'de'
         |       ELSE 'fr' END AS pred_lang
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "text_quality" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_words,
         |  ${occSql("text", ".")} + ${occSql("text", ",")} + ${occSql("text", "!")} AS n_punct,
         |  round(${occSql(pt, " the ")} / len(string_split(text, ' ')), 6) AS stop_ratio,
         |  round((length(text) - (length(text) - length(replace(text, ' ', ''))))
         |        / len(string_split(text, ' ')), 6) AS avg_wlen
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fp_md5 FROM documents ORDER BY doc_id",
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, md5(array_to_string(list_slice(t, i, i + 1), ' ')) AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
        |        FROM toks)),
        |pg AS (
        |  SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
        |ga AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, max(c) AS topn,
        |         count(*) AS ndist
        |  FROM pg GROUP BY doc_id)
        |SELECT toks.doc_id,
        |  CAST(len(t) AS INT) AS n_words,
        |  round(1.0 - len(list_distinct(t)) / len(t), 6) AS dup_word_frac,
        |  CAST(coalesce(n2, 0) AS BIGINT) AS n_2grams,
        |  round(topn / nullif(n2, 0), 6) AS top_2gram_frac,
        |  round(1.0 - ndist / nullif(n2, 0), 6) AS dup_2gram_frac
        |FROM toks LEFT JOIN ga ON toks.doc_id = ga.doc_id
        |ORDER BY toks.doc_id""".stripMargin,
    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (
        |  SELECT u.w1, count(*) AS c1
        |  FROM toks, UNNEST(t) AS u(w1) GROUP BY 1),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |bi AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, UNNEST(range(1, len(t))) AS r(i)),
        |bic AS (
        |  SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(CAST(SUM(CAST(ln((bic.c2 + 0.5) / (uni.c1 + 0.5 * vocab.v))
        |                      AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM bi b
        |JOIN bic ON b.w1 = bic.w1 AND b.w2 = bic.w2
        |JOIN uni ON b.w1 = uni.w1
        |CROSS JOIN vocab
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents),
        |c AS (
        |  SELECT doc_id, ch, count(*) AS c FROM ch WHERE ch <> '' GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
        |    CAST(SUM(CAST(c * ln(c) AS DECIMAL(18,6))) AS DOUBLE) AS clogc
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_chars,
        |  round(ln(n_chars) - clogc / n_chars, 6) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_decontaminate" ->
      """SELECT doc_id, md5(lower(text)) AS fp FROM documents
        |WHERE md5(lower(text)) NOT IN (
        |  SELECT md5(lower(text)) FROM documents WHERE doc_id < 10)
        |ORDER BY doc_id""".stripMargin,
    "mm_image_meta" -> {
      val rows = imageFixture.map { case (id, hex, meta) =>
        val nb = hex.length / 2
        meta match {
          case Some((f, w, h)) => s"($id, $nb, '$f', $w, $h)"
          case None =>
            s"($id, $nb, CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT))"
        }
      }.mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_bytes AS INT) AS n_bytes,
         |  format, CAST(width AS INT) AS width, CAST(height AS INT) AS height
         |FROM (VALUES $rows) AS t(doc_id, n_bytes, format, width, height)
         |ORDER BY doc_id""".stripMargin
    },
    "mm_audio_meta" -> {
      val rows = audioFixture.map { case (id, hex, meta) =>
        val nb = hex.length / 2
        meta match {
          case Some((f, sr, ch, bits)) => s"($id, $nb, '$f', $sr, $ch, $bits)"
          case None =>
            s"($id, $nb, CAST(NULL AS VARCHAR), CAST(NULL AS INT), " +
              "CAST(NULL AS INT), CAST(NULL AS INT))"
        }
      }.mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_bytes AS INT) AS n_bytes,
         |  format, CAST(sample_rate AS INT) AS sample_rate,
         |  CAST(channels AS INT) AS channels, CAST(bits AS INT) AS bits
         |FROM (VALUES $rows) AS t(doc_id, n_bytes, format, sample_rate, channels, bits)
         |ORDER BY doc_id""".stripMargin
    },
    "mm_video_meta" -> {
      val rows = videoFixture.map { case (id, hex, meta) =>
        val nb = hex.length / 2
        meta match {
          case Some((f, w, h, ms)) => s"($id, $nb, '$f', $w, $h, $ms)"
          case None =>
            s"($id, $nb, CAST(NULL AS VARCHAR), CAST(NULL AS INT), " +
              "CAST(NULL AS INT), CAST(NULL AS BIGINT))"
        }
      }.mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_bytes AS INT) AS n_bytes,
         |  format, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         |  CAST(duration_ms AS BIGINT) AS duration_ms
         |FROM (VALUES $rows) AS t(doc_id, n_bytes, format, width, height, duration_ms)
         |ORDER BY doc_id""".stripMargin
    },
    "mm_decode_meta" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(strlen(text) % 640 + 1 AS INT) AS width,
        |  CAST(strlen(text) % 480 + 1 AS INT) AS height,
        |  CAST(ceil(strlen(text) / 256.0) AS INT) AS n_frames,
        |  ascii(substr(text, 1, 1)) AS first_cp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // byte-bucket histogram over ASCII text: codepoint//16 == (byte&0xff)>>4.
    // Entropy summed over present buckets only, matching the c>0 guard in
    // Multimodal.featureExtract; round(6) absorbs summation-order ULPs.
    "mm_features" -> {
      val hCols = (0 until 16)
        .map(i => s"CAST(coalesce(sum(c) FILTER (WHERE bk = $i), 0) AS BIGINT) AS h$i")
        .mkString(",\n        |    ")
      s"""WITH pos AS (
         |  SELECT doc_id, text, length(text) AS n,
         |    unnest(generate_series(1, length(text))) AS i
         |  FROM documents),
         |cnt AS (
         |  SELECT doc_id, n, ascii(substr(text, i, 1)) // 16 AS bk, count(*) AS c
         |  FROM pos GROUP BY doc_id, n, bk),
         |h AS (
         |  SELECT doc_id,
         |    $hCols,
         |    round(-sum((c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))), 6) AS entropy,
         |    max(n) AS n
         |  FROM cnt GROUP BY doc_id),
         |dims AS (
         |  SELECT *, CAST(n % 640 + 1 AS INT) AS w0, CAST(n % 480 + 1 AS INT) AS hh0,
         |    greatest(n % 640 + 1, n % 480 + 1) AS m
         |  FROM h)
         |SELECT doc_id, ${(0 until 16).map(i => s"h$i").mkString(", ")}, entropy,
         |  CAST(CASE WHEN m <= 224 THEN w0 ELSE greatest(1, w0 * 224 // m) END AS INT) AS resized_w,
         |  CAST(CASE WHEN m <= 224 THEN hh0 ELSE greatest(1, hh0 * 224 // m) END AS INT) AS resized_h
         |FROM dims ORDER BY doc_id""".stripMargin
    },
    "dedup_decontaminate_ngram" ->
      """WITH bench AS (
        |  SELECT array_to_string(list_slice(string_split(text, ' '), 3, 15), ' ') AS btext
        |  FROM documents
        |  WHERE doc_id < 5 AND len(string_split(text, ' ')) >= 15),
        |bpos AS (
        |  SELECT string_split(btext, ' ') AS toks,
        |    unnest(generate_series(1, greatest(len(string_split(btext, ' ')) - 12, 0))) AS i
        |  FROM bench),
        |bgrams AS (
        |  SELECT DISTINCT md5(array_to_string(list_slice(toks, i, i + 12), ' ')) AS g
        |  FROM bpos),
        |dpos AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    unnest(generate_series(1, greatest(len(string_split(text, ' ')) - 12, 0))) AS i
        |  FROM documents),
        |bad AS (
        |  SELECT DISTINCT doc_id FROM dpos
        |  JOIN bgrams ON md5(array_to_string(list_slice(toks, i, i + 12), ' ')) = g)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,
    // the contamination REPORT ≡ exact n-gram joins by CONTENT (the
    // engines' md5 grams only ever join within one engine)
    "decontaminate_report" ->
      """WITH lifted AS (
        |  SELECT doc_id AS bench_id,
        |    array_to_string(list_slice(string_split(text, ' '), 3, 30), ' ') AS text
        |  FROM documents
        |  WHERE doc_id < 5 AND len(string_split(text, ' ')) >= 32),
        |clean AS (
        |  SELECT 100 + d AS bench_id,
        |    array_to_string(list_transform(range(1, 21),
        |      i -> 'zz' || CAST(100 + d AS VARCHAR) || '_' || CAST(i AS VARCHAR)),
        |      ' ') AS text
        |  FROM range(5) t(d)),
        |bench AS (SELECT * FROM lifted UNION ALL SELECT * FROM clean),
        |bpos AS (
        |  SELECT bench_id, string_split(text, ' ') AS toks,
        |    unnest(generate_series(1, greatest(len(string_split(text, ' ')) - 12, 0))) AS i
        |  FROM bench),
        |bgrams AS (
        |  SELECT DISTINCT bench_id,
        |    md5(array_to_string(list_slice(toks, i, i + 12), ' ')) AS g
        |  FROM bpos),
        |dpos AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    unnest(generate_series(1, greatest(len(string_split(text, ' ')) - 12, 0))) AS i
        |  FROM documents),
        |cgrams AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(list_slice(toks, i, i + 12), ' ')) AS g
        |  FROM dpos),
        |totals AS (SELECT bench_id, count(*) AS n_grams FROM bgrams GROUP BY 1),
        |hits AS (
        |  SELECT b.bench_id, count(DISTINCT b.g) AS hit_grams,
        |         count(DISTINCT c.doc_id) AS corpus_docs
        |  FROM bgrams b JOIN cgrams c USING (g) GROUP BY 1)
        |SELECT t.bench_id, t.n_grams,
        |  CAST(COALESCE(h.hit_grams, 0) AS BIGINT) AS hit_grams,
        |  CAST(COALESCE(h.hit_grams, 0) AS DOUBLE) / t.n_grams AS overlap_frac,
        |  CAST(COALESCE(h.corpus_docs, 0) AS BIGINT) AS corpus_docs
        |FROM totals t LEFT JOIN hits h ON t.bench_id = h.bench_id
        |ORDER BY t.bench_id""".stripMargin,
    "dedup_components" ->
      """SELECT range AS doc_id, range - (range % 50) AS component
        |FROM range(0, 1000) ORDER BY doc_id""".stripMargin,
    // component closed-form; fold = md5-prefix of the component mod 5
    "split_kfold" ->
      """SELECT range AS doc_id, range - (range % 50) AS component,
        |  ('0x' || substr(md5(CAST(range - (range % 50) AS VARCHAR)), 1, 8))::BIGINT
        |    % 5 AS fold
        |FROM range(0, 1000) ORDER BY doc_id""".stripMargin,
    // closed-form clusters + portable quality ⇒ the argmax is stated
    // analytically; ties (quality repeats mod 101 within a 50-chain
    // only if aligned — the id tiebreak settles them) break low-id
    "dedup_keep_best" ->
      """WITH m AS (
        |  SELECT range AS id, range - (range % 50) AS comp,
        |         (range * 37) % 101 AS q
        |  FROM range(0, 1000)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY comp
        |    ORDER BY q DESC, id) AS rn FROM m)
        |SELECT comp AS component, id AS survivor, q AS quality
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin,
    "text_common_spans" ->
      """WITH pos AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    unnest(generate_series(1, greatest(len(string_split(text, ' ')) - 4, 0))) AS i
        |  FROM documents),
        |dg AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS g
        |  FROM pos)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_docs
        |FROM dg GROUP BY g
        |HAVING count(*) >= 3
        |ORDER BY n_docs DESC, g""".stripMargin,
    // same 5-gram/minDocs=3 span derivation as text_common_spans, then
    // resolved to positions: token j (1-based) is boilerplate iff some
    // offending window start i covers it (i <= j <= i+4)
    "text_boilerplate" ->
      """WITH pos AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    unnest(generate_series(1, greatest(len(string_split(text, ' ')) - 4, 0))) AS i
        |  FROM documents),
        |gr AS (
        |  SELECT doc_id, i, md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS g
        |  FROM pos),
        |common AS (
        |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM gr) dg
        |  GROUP BY g HAVING count(*) >= 3),
        |starts AS (
        |  SELECT DISTINCT gr.doc_id, gr.i FROM gr JOIN common ON gr.g = common.g),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) AS j
        |  FROM documents),
        |covered AS (
        |  SELECT DISTINCT t.doc_id, t.j FROM tok t
        |  JOIN starts s ON t.doc_id = s.doc_id AND t.j BETWEEN s.i AND s.i + 4),
        |kept AS (
        |  SELECT t.doc_id, t.j, t.tok FROM tok t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.j = c.j
        |  WHERE c.j IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
        |         count(*) AS nk
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(a.clean_text, '') AS clean_text,
        |  round(1.0 - coalesce(nk, 0) / len(string_split(d.text, ' ')), 6)
        |    AS boilerplate_frac
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_bm25" -> bm25OracleSql,
    // same start-multiples-of-stride rule: a start survives iff it is
    // 0 or the previous window stopped short of the end
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n, CAST(u.s AS BIGINT) AS chunk_start,
        |    array_to_string(list_slice(toks, CAST(u.s AS BIGINT) + 1,
        |                               CAST(u.s AS BIGINT) + 32), ' ') AS chunk_text
        |  FROM t, UNNEST(range(0, n, 24)) AS u(s)
        |  WHERE u.s = 0 OR u.s - 24 + 32 < n)
        |SELECT doc_id, chunk_start,
        |  CAST(least(32, n - chunk_start) AS BIGINT) AS n_tokens, chunk_text
        |FROM c ORDER BY doc_id, chunk_start""".stripMargin,
    "dedup_edit" ->
      """WITH p AS (
        |  SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, string_split(name, ' ')[1] AS blk FROM p)
        |SELECT a.name AS name_a, b2.name AS name_b,
        |  CAST(levenshtein(a.name, b2.name) AS BIGINT) AS dist
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.name < b2.name
        |WHERE levenshtein(a.name, b2.name) <= 4
        |ORDER BY name_a, name_b""".stripMargin,
    // RRF fusion of the bm25 CTE chain and the cosine ranking; ranks
    // are row_numbers over the same (score desc, id) orders both
    // engines produce bit-identically, and the fused score is integer
    // division — nothing float crosses the engines
    "text_hybrid_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(len(t) AS DECIMAL(18,6))) AS DOUBLE) AS sdl
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, CAST(len(t) AS INT) AS dl, u.term, count(*) AS tf
        |  FROM toks, UNNEST(t) AS u(term)
        |  WHERE u.term IN ('dup', 'vector', 'join')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |bmscore AS (
        |  SELECT tf.doc_id,
        |    CAST(SUM(CAST(
        |      ln((n - df + 0.5) / (df + 0.5) + 1.0)
        |        * (tf * (1.2 + 1.0))
        |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n)))
        |      AS DECIMAL(18,6))) AS DOUBLE) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN stats
        |  GROUP BY tf.doc_id),
        |bm AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        |  FROM bmscore ORDER BY score DESC, doc_id LIMIT 50),
        |cosred AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        |  FROM embeddings WHERE vec_id <> 0),
        |cs AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
        |  FROM cosred ORDER BY cosine DESC, doc_id LIMIT 50)
        |SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
        |  COALESCE(1000000 // (60 + bm.r), 0)
        |    + COALESCE(1000000 // (60 + cs.r), 0) AS rrf,
        |  bm.r AS bm25_rank, cs.r AS cosine_rank
        |FROM bm FULL JOIN cs ON bm.doc_id = cs.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    // the indexed serving path must produce the IDENTICAL ranking —
    // one oracle, two execution strategies
    "text_bm25_indexed" -> bm25OracleSql,
    // the WARC round trip hands back exactly the original pairs
    "ingest_warc" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    // wrap-then-extract is the identity on tag-free prose
    "text_html_extract" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    // the formatted text is an ordered string_agg; span offsets are
    // prefix sums of segment lengths (content only: role tag + <|,|>
    // excluded at the front, <|end|> at the back)
    "pack_chat" ->
      """WITH t AS (
        |  SELECT user_id AS conv_id, event_type AS role,
        |         COALESCE(props, '') AS content,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT conv_id, rn, role,
        |         '<|' || role || '|>' || content || '<|end|>' AS seg
        |  FROM t),
        |o AS (
        |  SELECT conv_id, rn, role, seg,
        |         COALESCE(SUM(length(seg)) OVER (
        |           PARTITION BY conv_id ORDER BY rn
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM s),
        |txt AS (
        |  SELECT conv_id, string_agg(seg, '' ORDER BY rn) AS text
        |  FROM s GROUP BY conv_id)
        |SELECT o.conv_id, txt.text,
        |       CAST(o.off + length(o.role) + 4 AS BIGINT) AS span_start,
        |       CAST(o.off + length(o.seg) - 7 AS BIGINT) AS span_end
        |FROM o JOIN txt USING (conv_id)
        |WHERE o.role = 'purchase'
        |ORDER BY conv_id, span_start""".stripMargin,
    // the good side of the quarantined ingest is exactly the exported
    // subset — corruption never reaches it
    "ingest_jsonl" ->
      """SELECT doc_id, source, length(text) AS n_chars
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "text_heavy_hitters" ->
      """SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok <> ''
        |GROUP BY source, tok
        |ORDER BY source, n DESC, tok""".stripMargin,
    "text_vocab" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok <> ''
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 1000""".stripMargin,
    "dedup_url" -> {
      val rows = urlFixture
        .map { case (id, _, canon) => s"($id, '${canon.replace("'", "''")}')" }
        .mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, url_canon
         |FROM (VALUES $rows) AS t(doc_id, url_canon)
         |ORDER BY doc_id""".stripMargin
    },
    // the cycle is 1-regular: uniform 1/N is the exact fixed point
    "graph_pagerank" ->
      """SELECT range AS node, 0.01 AS pr FROM range(100) ORDER BY node""".stripMargin,
    // each stage recomputed analytically; packing's seq count is the
    // distinct floor(offset/budget) over the doc_id-ordered prefix sum
    "curation_sweep" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |q AS (SELECT * FROM t WHERE n_tokens >= 56),
        |surv AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
        |dedup AS (SELECT q.* FROM q JOIN surv USING (doc_id)),
        |ord AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS off
        |  FROM dedup),
        |packed AS (
        |  SELECT COUNT(DISTINCT off // 256) AS n,
        |         CAST(SUM(n_tokens) AS BIGINT) AS tok
        |  FROM ord)
        |SELECT '1_raw' AS stage, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM t
        |UNION ALL SELECT '2_quality', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM q
        |UNION ALL SELECT '3_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM dedup
        |UNION ALL SELECT '4_packed', n, tok FROM packed
        |ORDER BY stage""".stripMargin,
    // ground truth = the unfiltered token equi-join: intersection
    // counts per name pair, jaccard from set sizes — the prefix filter
    // must lose nothing above the threshold and admit nothing below
    "dedup_jaccard_join" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |toks AS (
        |  SELECT DISTINCT p_name AS doc_id, u.term AS tok
        |  FROM (SELECT p_name, string_split(p_name, ' ') AS t FROM names),
        |       UNNEST(t) AS u(term) WHERE len(u.term) > 0),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS name_a, b.doc_id AS name_b, COUNT(*) AS i
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT name_a, name_b, jaccard FROM (
        |  SELECT name_a, name_b,
        |    round(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6)
        |      AS jaccard
        |  FROM inter
        |  JOIN sz sa ON name_a = sa.doc_id
        |  JOIN sz sb ON name_b = sb.doc_id)
        |WHERE jaccard >= 0.3 ORDER BY name_a, name_b""".stripMargin,
    "text_feature_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (
        |  SELECT doc_id, u.term AS tok
        |  FROM toks, UNNEST(t) AS u(term) WHERE len(u.term) > 0)
        |SELECT doc_id,
        |  ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 AS bucket,
        |  COUNT(*) AS n
        |FROM tok GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,
    // the oracle replays the identical salted md5 draw per group
    "sample_per_group" ->
      """SELECT grp, doc_id FROM (
        |  SELECT CAST(doc_id % 7 AS INT) AS grp, doc_id,
        |    row_number() OVER (
        |      PARTITION BY doc_id % 7
        |      ORDER BY md5('s0:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 5 ORDER BY grp, doc_id""".stripMargin,
    "sample_prop" ->
      """SELECT doc_id, n_chars,
        |  round(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |             + 1.0) / 4294967296.0)
        |        / CAST(n_chars AS DOUBLE), 6) AS samp_key
        |FROM documents ORDER BY samp_key, doc_id LIMIT 100""".stripMargin,
    // a real recursive CTE against the pointer-doubling plan
    "graph_hierarchy" ->
      """WITH RECURSIVE h(node, root, depth) AS (
        |  SELECT range AS node, range AS root, CAST(0 AS BIGINT) AS depth
        |  FROM range(127) WHERE range = 0
        |  UNION ALL
        |  SELECT c.node, h.root, h.depth + 1
        |  FROM (SELECT range AS node, (range - 1) // 2 AS parent
        |        FROM range(127) WHERE range > 0) c
        |  JOIN h ON c.parent = h.node)
        |SELECT node, root, depth FROM h ORDER BY node""".stripMargin,
    // closed form: the chain and bridge peel away, the 10-clique stays
    // with every internal degree 9
    "graph_kcore" ->
      """SELECT range AS node, CAST(9 AS BIGINT) AS degree FROM range(10)
        |ORDER BY node""".stripMargin,
    // same deterministic line construction (tokens regrouped 8/line),
    // then: first global occurrence per line hash wins, docs
    // reassemble from surviving positions
    "dedup_lines" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, CAST(u.s AS BIGINT) // 8 AS pos,
        |    array_to_string(list_slice(toks, CAST(u.s AS BIGINT) + 1,
        |                               CAST(u.s AS BIGINT) + 8), ' ') AS line
        |  FROM t, UNNEST(range(0, n, 8)) AS u(s)),
        |kept AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
        |  FROM lines),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
        |         COUNT(*) AS n_kept
        |  FROM kept WHERE rn = 1 GROUP BY doc_id),
        |orig AS (SELECT doc_id, COUNT(*) AS n_orig FROM lines GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.text_dedup, '') AS text_dedup,
        |  COALESCE(a.n_kept, 0) AS n_kept, o.n_orig
        |FROM documents d
        |JOIN orig o USING (doc_id)
        |LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // naive id-ordered enumeration: canonical a<b edges, wedge join,
    // closing-edge join — orientation-free, so it checks the Spark
    // side's degree-oriented plan by triangle-set equality
    "graph_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        |       JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, count(*) AS n_triangles FROM (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |GROUP BY node ORDER BY n_triangles DESC, node LIMIT 20""".stripMargin,
    "split_leakage_safe" ->
      """SELECT range AS doc_id, range - (range % 50) AS component,
        |  CASE WHEN substr(md5(CAST(range - (range % 50) AS VARCHAR)), 1, 4) < '4000'
        |       THEN 'val' ELSE 'train' END AS split
        |FROM range(0, 1000) ORDER BY doc_id""".stripMargin,
    // 0.25 is exact in binary AND decimal, so ceil(frac*n) can't split
    // between DuckDB's decimal literals and Spark's doubles
    "sample_temperature" ->
      """WITH c AS (SELECT event_type AS domain, count(*) AS n FROM events GROUP BY 1),
        |w AS (SELECT domain, n,
        |        CAST(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS w
        |      FROM c),
        |q0 AS (
        |  SELECT domain, n, w,
        |    1000.0 * w / CAST(SUM(CAST(w AS DECIMAL(18,6))) OVER () AS DOUBLE) AS share
        |  FROM w),
        |q1 AS (
        |  SELECT domain, n, CAST(floor(share) AS BIGINT) AS base,
        |    share - floor(share) AS fr,
        |    1000 - SUM(CAST(floor(share) AS BIGINT)) OVER () AS rem,
        |    row_number() OVER (ORDER BY share - floor(share) DESC, domain) AS rk
        |  FROM q0),
        |q AS (
        |  SELECT domain,
        |    least(n, base + CASE WHEN rk <= rem THEN 1 ELSE 0 END) AS quota
        |  FROM q1),
        |sel AS (
        |  SELECT e.event_id, e.event_type AS domain, q.quota,
        |    row_number() OVER (PARTITION BY e.event_type
        |      ORDER BY md5(CAST(e.event_id AS VARCHAR)), e.event_id) AS rk
        |  FROM events e JOIN q ON e.event_type = q.domain)
        |SELECT event_id, domain FROM sel WHERE rk <= quota
        |ORDER BY event_id""".stripMargin,
    // mirror mixture(): availability aggregate, integer epoch plan,
    // md5-prefix partial epoch — all-integer comparisons, exact parity
    "sample_mixture" ->
      """WITH base AS (
        |  SELECT doc_id, lang AS domain, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM documents),
        |w(domain, wt) AS (VALUES
        |  ('en', CAST(0.25 AS DOUBLE)), ('de', CAST(0.25 AS DOUBLE)),
        |  ('es', CAST(0.25 AS DOUBLE)), ('fr', CAST(0.125 AS DOUBLE)),
        |  ('zh', CAST(0.125 AS DOUBLE))),
        |plan AS (
        |  SELECT a.domain,
        |    LEAST(CAST(floor(120000 * wt) AS BIGINT) // av, 4) AS full_e,
        |    CASE WHEN CAST(floor(120000 * wt) AS BIGINT) // av >= 4 THEN 0
        |         ELSE CAST(floor(120000 * wt) AS BIGINT)
        |              - LEAST(CAST(floor(120000 * wt) AS BIGINT) // av, 4) * av
        |    END AS rem
        |  FROM (SELECT lang AS domain, SUM(n_chars) AS av
        |        FROM documents GROUP BY 1) a
        |  JOIN w USING (domain)),
        |n(i) AS (VALUES (0), (1), (2), (3))
        |SELECT b.doc_id, b.domain, CAST(n.i AS BIGINT) AS epoch,
        |  CAST(b.cum_tokens AS BIGINT) AS cum_tokens
        |FROM base b JOIN plan p USING (domain)
        |JOIN n ON n.i < p.full_e
        |  + CASE WHEN b.cum_tokens <= p.rem THEN 1 ELSE 0 END
        |ORDER BY domain, epoch, doc_id""".stripMargin,
    "sample_token_budget" ->
      """WITH s AS (
        |  SELECT doc_id, source AS domain,
        |    SUM(len(string_split(text, ' '))) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM documents)
        |SELECT doc_id, domain, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM s WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(length(text) % 4 AS INT) AS stratum,
        |    row_number() OVER (PARTITION BY length(text) % 4
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY length(text) % 4) AS n
        |  FROM documents)
        |SELECT doc_id, stratum FROM s
        |WHERE rk <= ceil(0.25 * n) ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(length(text) % 4 AS INT) AS stratum,
        |    row_number() OVER (PARTITION BY length(text) % 4
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY length(text) % 4) AS n
        |  FROM documents)
        |SELECT doc_id, stratum FROM s
        |WHERE rk <= ceil((CASE stratum WHEN 0 THEN 0.5 WHEN 1 THEN 0.25
        |                  WHEN 2 THEN 0.0 ELSE 0.125 END) * n)
        |ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM t)
        |SELECT doc_id, n_tokens, tok_offset,
        |  CAST(tok_offset // 2048 AS BIGINT) AS seq_id
        |FROM o ORDER BY doc_id""".stripMargin,
    "sim_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS s,
        |    CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |qq AS (
        |  SELECT vec_id, s,
        |    list_transform(e, x -> CAST(CASE WHEN s = 0 THEN 0
        |                                ELSE round(x / s) END AS INT)) AS q
        |  FROM q)
        |SELECT vec_id, round(s, 6) AS q_scale,
        |  CAST(coalesce(list_sum(q), 0) AS BIGINT) AS q_sum,
        |  CAST(coalesce(list_sum(list_transform(q, x -> abs(x))), 0) AS BIGINT) AS q_l1,
        |  CAST(list_min(q) AS INT) AS q_min,
        |  CAST(list_max(q) AS INT) AS q_max
        |FROM qq ORDER BY vec_id""".stripMargin,
    "pack_length_batch" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens, CAST(floor(n_tokens / 16) AS BIGINT) AS bucket
        |  FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM b)
        |SELECT bucket, CAST((rn - 1) // 8 AS BIGINT) AS batch_in_bucket,
        |  count(*) AS n_docs, max(n_tokens) AS batch_seqlen,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  count(*) * max(n_tokens) - CAST(sum(n_tokens) AS BIGINT) AS pad_waste
        |FROM r GROUP BY 1, 2 ORDER BY bucket, batch_in_bucket""".stripMargin,
    "shuffle_deterministic" ->
      """SELECT doc_id,
        |  md5('epoch1' || '#' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  row_number() OVER (
        |    ORDER BY md5('epoch1' || '#' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |    AS shuffle_pos
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_framesample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(ceil(length(text) / 256.0) AS INT) - 1)) AS i
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  CAST(i AS BIGINT) AS frame_idx,
        |  CAST(least(256, length(text) - i * 256) AS INT) AS frame_len,
        |  md5(substr(text, CAST(i * 256 + 1 AS INT), 256)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
