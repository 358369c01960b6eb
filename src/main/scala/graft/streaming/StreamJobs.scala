package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.tables.Tables

/** Structured Streaming jobs over the events stream.
  *
  * The batch-parity shapes live in WarehouseQueries (q_time_window /
  * stream_window_counts); here the same plans run incrementally:
  * watermark bounds state, tumbling windows aggregate per event-type.
  * At scale this is the `readStream → withWatermark → window agg →
  * writeStream` shape; locally the parquet file drives one batch via
  * `processAllAvailable`.
  */
object StreamJobs {

  /** Streaming source over a directory of event parquet files (file
    * sources stream new files as they land), with the nanos→micros
    * normalization the batch loader applies. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Hourly tumbling-window counts per event type, 2h watermark. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("wstart"), col("event_type"), col("n"))

  /** Streaming sessionization via the built-in `session_window`: a
    * per-user session absorbs events while the inter-event gap stays
    * UNDER `gap`, then closes — the state store keeps one open window
    * per (user, session) and the watermark lets closed sessions
    * finalize and evict. This is the incremental counterpart of the
    * batch q_sessionize lag/cumsum shape; the parity spec runs THIS
    * operator both ways, since session_window's boundary (an exactly-
    * gap-sized pause starts a new session) differs from the lag
    * formulation's strict-inequality by one instant. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").cast("long").as("sess_start"),
        col("session_window.end").cast("long").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Stateful per-user running totals via mapGroupsWithState — the
    * custom-state shape (KeyValueGroupedDataset) for logic windowed
    * aggs can't express. State is one (count, sum) pair per user;
    * at scale the state store shards by the group key. */
  def userTotalsStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val typed = events.select(col("user_id"), col("value")).as[(Long, Double)]
    typed
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          (user, n, s)
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** Stream-stream join: purchases joined to the same user's clicks
    * within the preceding 30 minutes. Both sides carry watermarks so
    * the state store can evict rows once the join window has passed —
    * the bounded-state form of an event-correlation join. */
  def clickToPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(
      clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Streaming dedup: drop repeated (user_id, event_type) observations
    * arriving within the watermark horizon — the streaming counterpart
    * of Dedup.exact with bounded state (keys older than the watermark
    * are evicted from the state store). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** Streaming near-duplicate candidate pairs: the incremental form of
    * Dedup.minhashCandidates. Each arriving doc computes its MinHash
    * band signatures PER ROW (shingle → hash → per-band min, all
    * codegen'd lambda arithmetic — no groupBy, because a streaming doc
    * arrives whole, unlike the batch path which explodes + re-aggregates
    * for map-side combining), then each (band, bucket) group keeps ONE
    * state value: the first doc to claim the bucket. Later arrivals in
    * the bucket emit a (representative, newcomer) candidate pair.
    *
    * The same band key on the same text yields the same bucket as the
    * batch operator (identical hash math), so streamed pairs are a
    * subset of batch candidates by construction — the spec asserts
    * both that and recall of the planted near-dup.
    *
    * Scale: state is one long per OCCUPIED bucket, sharded by the
    * state store on the group key; pair emission is local to a bucket.
    * For an unbounded corpus pass `idleTimeout` (e.g. "30 minutes"):
    * buckets idle past it evict, so the dedup horizon matches the
    * retention window — the same trade dropDuplicatesWithinWatermark
    * makes. Both halves of that swap live here: the
    * ProcessingTimeTimeout mode AND the per-invocation
    * `state.setTimeoutDuration` re-arm in the data branch — GroupState
    * timeouts are not standing registrations, so a bucket whose data
    * branch never re-arms is never offered the timeout callback and
    * would never evict. A pair surfacing through several bands is emitted once per
    * band (batch applies a distinct; an append stream cannot without a
    * second stateful stage) — consumers treat candidates as a multiset. */
  def nearDupPairsStream(spark: SparkSession, docs: DataFrame,
                         shingleK: Int = 2, bands: Int = 8,
                         rowsPerBand: Int = 4,
                         idleTimeout: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val withSig = docs
      .withColumn("sh", graft.functions.WordShingles.shingles(col("text"), shingleK))
      .filter(size(col("sh")) > 0)
      .withColumn("h0", transform(col("sh"), s => xxhash64(s)))
    // the seed + band layout comes from Dedup.seedHash/bandHash — the
    // SAME expressions the batch path aggregates, which is what makes
    // streamed buckets equal batch buckets
    val bandCols = (0 until bands).map(b =>
      graft.operators.Dedup.bandHash(
        i => array_min(transform(col("h0"), h => graft.operators.Dedup.seedHash(i, h))),
        b, rowsPerBand))
    val timeoutMode =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    withSig
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, bh) => (band, bh) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutMode) {
        (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val ids = rows.map(_._1).toSeq.distinct.sorted
          if (ids.isEmpty) {
            // timeout invocation (no new rows): evict the idle bucket
            // and emit nothing (under a timeout the function IS called
            // with an empty iterator)
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val rep = state.getOption.getOrElse(ids.head)
            if (!state.exists) state.update(rep)
            // re-arm on every data invocation — GroupState timeouts
            // are per-invocation, not standing registrations; a bucket
            // that never re-arms is never offered the timeout path
            idleTimeout.foreach(state.setTimeoutDuration)
            ids.filter(_ != rep)
              .map(d => (math.min(rep, d), math.max(rep, d))).iterator
          }
      }
      .toDF("doc_a", "doc_b")
  }

  /** Streaming heavy hitters — TextOps.heavyHitterSketches' lakehouse
    * rollup running incrementally: every micro-batch reduces to ONE
    * `approx_top_k_accumulate` sketch row per source (a
    * maxTracked-bounded binary) appended to `sinkPath` tagged with its
    * batch id. Any later reader answers top-k over ANY set of slices
    * via [[heavyHittersFromSlices]] — n sketch merges, never a token
    * rescan. State is bounded twice over: the per-batch aggregation
    * holds maxTracked counters per group, and the stream itself keeps
    * NO cross-batch state (the sink rows ARE the rollup), so this runs
    * forever on an unbounded token stream. Exact-regime slices combine
    * exactly (the batch-parity spec); the approximation regime
    * inherits heavyHitters' frequent-items guarantees. */
  def heavyHitterSketchStream(docs: DataFrame, sinkPath: String,
                              maxTracked: Int = 10000): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextOps.heavyHitterSketches(batch, maxTracked)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Combine-on-read over the slice sink: per-source top-k from the
    * accumulated sketches (same output shape as TextOps.heavyHitters).
    * Slices dedup on (source, batch_id) first — a micro-batch replayed
    * after a crash lands its identical slice row twice in the
    * append-only sink, and merging both would double-count that
    * batch's tokens. */
  def heavyHittersFromSlices(spark: SparkSession, sinkPath: String,
                             k: Int = 40): DataFrame =
    graft.operators.TextOps.combineHeavyHitterSketches(
      spark.read.parquet(sinkPath)
        .dropDuplicates("source", "batch_id")
        .select("source", "sketch"), k)

  /** Run a streaming aggregate to a named in-memory sink and block until
    * the source is drained (local smoke path). */
  /** Streaming N-step ordered funnel — the incremental form of
    * [[graft.operators.Funnel.funnel]]: per-user state is the array of
    * earliest QUALIFIED per-step times (step i's time only set from an
    * event at-or-after the qualified step i−1 time, within `maxGap`
    * when given), folded over events in (micro-batch, ts, tie) order.
    * Emits (user_id, depth) per user per batch — depth = how many
    * funnel steps the user has completed in order so far; the reach
    * counts are `count(depth >= i)` downstream.
    *
    * Parity boundary (same honesty as [[sessionCounts]]): the fold
    * matches the batch operator exactly when per-user events arrive in
    * timestamp order ACROSS micro-batches (in-batch disorder is sorted
    * away locally). A step event arriving in a later batch with an
    * earlier timestamp than an already-qualified successor cannot
    * retro-qualify it — the price of O(steps) state per user instead
    * of a replay buffer; the spec pins batch parity on time-sliced
    * arrivals.
    *
    * Scale: state is `steps.length` longs per user, sharded by the
    * state store on user_id; non-step events are filtered before the
    * shuffle (the same pre-shuffle prune as the batch funnel). */
  def funnelStream(spark: SparkSession, events: DataFrame, steps: Seq[String],
                   maxGap: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val gapMicros: Option[Long] = maxGap.map { g =>
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(g))
      require(iv.months == 0, s"funnelStream maxGap must be sub-month, got $g")
      iv.days * 86400000000L + iv.microseconds
    }
    val stepIdx = steps.zipWithIndex.toMap
    val unset = Long.MaxValue
    events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          val t = state.getOption.getOrElse(Array.fill(steps.size)(unset))
          // in-batch disorder sorts away; ties break on event_id like
          // the batch window's tieCol
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, et) =>
            val i = stepIdx(et)
            val qualifies =
              if (i == 0) true
              else t(i - 1) != unset && ts >= t(i - 1) &&
                gapMicros.forall(g => ts <= t(i - 1) + g)
            if (qualifies && ts < t(i)) t(i) = ts
          }
          state.update(t)
          (user, t.takeWhile(_ != unset).length)
      }
      .toDF("user_id", "depth")
  }

  /** Streaming recency-decayed engagement score — the incremental form
    * of WarehouseQueries.decayScore: state is TWO numbers per user
    * (the score anchored at the user's LAST event, and that event's
    * time). On each event the carried score decays by the elapsed gap
    * and the value adds:
    *   score' = score · 2^(−(ts − last)/halfLife) + value
    * which is algebraically the batch anchor-sum re-anchored at every
    * event — so a consumer recovers the batch number for any anchor T
    * with one multiply: score·2^(−(T − last)/halfLife) (the parity
    * spec does exactly that against q_decay_score). Emits
    * (user_id, last_tsu, score) per touched user per micro-batch.
    * In-batch disorder sorts away locally; cross-batch out-of-order
    * events are the documented boundary (the funnelStream contract —
    * O(1) state instead of a replay buffer). */
  def decayScoreStream(spark: SparkSession, events: DataFrame,
                       halfLifeDays: Double = 1.0): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val hlMicros = halfLifeDays * 86400000000.0
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          var (last, score) = state.getOption.getOrElse((Long.MinValue, 0.0))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, v) =>
            score =
              (if (last == Long.MinValue) 0.0
               else score * math.pow(2.0, (last - ts) / hlMicros)) + v
            last = ts
          }
          state.update((last, score))
          (user, last, score)
      }
      .toDF("user_id", "last_tsu", "score")
  }

  /** Maintain a streaming aggregate as a QUERYABLE TxLog table: each
    * update-mode micro-batch (the changed groups only) lands as one
    * transactional MERGE — readers see whole batches (snapshot
    * isolation), any version is time-travelable, and downstream
    * consumers read a plain table instead of holding a streaming
    * query open. Replay safety here is by IDEMPOTENCE rather than the
    * appendBatch watermark: re-merging an identical update batch
    * produces the identical table (merges are idempotent in content),
    * which is exactly the guarantee update-mode re-delivery needs.
    * `aggUpdates`' group keys must be unique per batch (aggregate
    * output always is — `preValidated` rides on that). Create the
    * TxLog table first with the aggregate's schema, partitioned. */
  def aggMergeStream(aggUpdates: DataFrame, tablePath: String,
                     keys: Seq[String],
                     checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = aggUpdates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.storage.TxLog.mergeInto(tablePath, batch, keys, preValidated = true)
        ()
      }
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }

  /** Streaming CDC relay — keep a REPLICA table following a source's
    * change-data feed as the changes arrive: each micro-batch of CDF
    * rows (insert / update / delete, the `TxLog.changes` shape)
    * applies to the replica as ONE `applyChanges` commit. This is the
    * continuous form of the batch CDC consumer (26af): the primary
    * publishes `changes(vN, vN+1)` rows to a feed directory as they
    * commit; the replica tails the directory and stays
    * versions-behind-bounded without ever re-reading the primary.
    *
    * Semantics ride entirely on applyChanges: inserts/updates merge,
    * deletes drop, only partitions holding a changed key rewrite. One
    * commit per micro-batch = snapshot isolation per batch; a batch
    * that carries several keys' changes applies atomically.
    * `update_preimage` rows are metadata for aggregate consumers and
    * are filtered out here — the postimage carries the row.
    *
    * A file-tailed feed can deliver SEVERAL published version-pairs
    * in one micro-batch, and a key changed in more than one pair
    * would then reach applyChanges twice with a nondeterministic
    * survivor (review finding). Publish the pair's upper version in a
    * column and pass it as `versionCol`: the batch collapses to the
    * LAST change per key ordered by that version before applying —
    * correct because applyChanges upserts insert/update uniformly
    * against current replica state and a trailing delete of a
    * never-applied insert is a no-op. Without `versionCol` the
    * duplicate-key guard runs and a multi-pair batch FAILS LOUDLY
    * instead of corrupting the replica. */
  def cdcRelayStream(feed: DataFrame, replicaPath: String,
                     keys: Seq[String],
                     versionCol: Option[String] = None,
                     checkpointLocation: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, row_number, when}
    val w = feed.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val normalized = batch.filter(col("_change_type") =!= "update_preimage")
          .withColumn("_change_type",
            when(col("_change_type") === "update_postimage", "update")
              .otherwise(col("_change_type")))
        val (rows, validated) = versionCol match {
          case Some(vc) =>
            val byKey = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*).orderBy(col(vc).desc)
            (normalized.withColumn("_rn", row_number().over(byKey))
              .filter(col("_rn") === 1).drop("_rn", vc), true)
          case None => (normalized, false)
        }
        if (!rows.isEmpty)
          graft.storage.TxLog.applyChanges(replicaPath, rows, keys,
            preValidated = validated)
        ()
      }
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }

  /** Streaming ANN index ingest — the vector-side of the incremental
    * story: each arriving micro-batch of embeddings assigns to the
    * EXISTING IVF centroids and appends to the cell partitions
    * (Ivf.append — no refit, no corpus rescan, pre-existing files
    * byte-identical), so the index follows the stream and a query
    * issued between batches finds everything ingested so far. Pair
    * with Ivf.remove for the erasure side; refitting centroids stays
    * an offline decision as the distribution drifts. */
  def annIngestStream(vectors: DataFrame,
                      index: graft.operators.Ivf.IvfIndex,
                      checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Ivf.append(batch.sparkSession, index, batch)
        ()
      }
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }

  def runToMemory(df: DataFrame, name: String, mode: String = "complete"): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
