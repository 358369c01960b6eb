package graft

import graft.queries.WarehouseQueries
import graft.streaming.StreamJobs

class StreamingSpec extends SparkSpec {

  test("streaming window counts match the batch-parity query") {
    // file stream sources want a directory; stage the events there
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = StreamJobs.eventsStream(spark, dir)
    val q = StreamJobs.runToMemory(StreamJobs.windowCounts(stream), "wc_test")
    try {
      val streamed = spark.table("wc_test")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = WarehouseQueries.streamWindowCounts(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "streaming result diverges from batch plan")
    } finally q.stop()
  }

  test("streaming session_window sessions match the batch run of the same operator") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.sessionCounts(StreamJobs.eventsStream(spark, dir)), "sess_test")
    try {
      val streamed = spark.table("sess_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      val batch = StreamJobs.sessionCounts(graft.tables.Tables.events(spark, sf))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(streamed == batch, "streaming sessions diverge from the batch plan")
      assert(streamed.nonEmpty)
      // sessions per user never exceed that user's event count, and
      // every session holds at least one event
      assert(streamed.values.forall(_ >= 1L))
    } finally q.stop()
  }

  test("stream-stream click→purchase join matches the batch join") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.clickToPurchaseJoin(StreamJobs.eventsStream(spark, dir)),
      "ss_join", mode = "append")
    try {
      val streamed = spark.table("ss_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = StreamJobs.clickToPurchaseJoin(graft.tables.Tables.events(spark, sf))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, "stream-stream join diverges from batch join")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup emits each (user, event_type) key once") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.dedupStream(StreamJobs.eventsStream(spark, dir)),
      "dd_test", mode = "append")
    try {
      val out = spark.table("dd_test")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.length == out.distinct.length, "duplicate keys leaked")
      val batchKeys = graft.tables.Tables.events(spark, sf)
        .select("user_id", "event_type").distinct().count()
      assert(out.length == batchKeys, "missing keys vs batch distinct")
    } finally q.stop()
  }

  test("streaming near-dup candidates are batch candidates and recall the planted near-dup") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again and once"),
      (3L, "completely unrelated text about spark catalyst optimizer internals here")
    ).toDF("doc_id", "text")
    val dir = "/tmp/graft_stream_docs"
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.nearDupPairsStream(spark, stream), "nd_test", mode = "append")
    try {
      val streamed = spark.table("nd_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.Dedup.minhashCandidates(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.subsetOf(batch),
        s"streamed pair not in batch candidates: ${streamed -- batch}")
      assert(streamed.contains((0L, 1L)), "exact dup pair missed by the stream")
      // every doc in a multi-doc cluster surfaces in some pair
      assert(streamed.exists(p => p._1 == 2L || p._2 == 2L), "near dup never paired")
      assert(!streamed.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
    } finally q.stop()
  }

  test("near-dup idleTimeout evicts idle buckets: a twin arriving after the horizon pairs with nothing") {
    import spark.implicits._
    // NOTE: with ProcessingTimeTimeout the engine keeps scheduling
    // batches to serve due timeouts, so `processAllAvailable` never
    // sees a quiescent stream — the test paces the trigger and POLLS
    // the sink instead of draining it
    val textX = "the quick brown fox jumps over the lazy dog again and again and again"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_evict").toString
    def emit(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").write.mode("append").parquet(dir)
    emit((0L, textX), (1L, textX))
    val stream = spark.readStream
      .schema(Seq((0L, "")).toDF("doc_id", "text").schema).parquet(dir)
    val q = StreamJobs.nearDupPairsStream(spark, stream, idleTimeout = Some("2 seconds"))
      .writeStream.outputMode("append").format("memory").queryName("nd_evict")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    def pairs(): Set[(Long, Long)] = spark.table("nd_evict")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def await(pred: Set[(Long, Long)] => Boolean): Boolean = {
      val end = System.currentTimeMillis + 90000
      while (System.currentTimeMillis < end && !pred(pairs())) Thread.sleep(250)
      pred(pairs())
    }
    try {
      // dup pair arriving within one horizon is caught
      assert(await(_.contains((0L, 1L))), s"in-horizon dup pair missed: ${pairs()}")
      // idle past the timeout: the engine self-schedules batches, the
      // timed-out textX buckets are invoked with empty iterators and
      // evicted — the dedup horizon equals the retention window
      Thread.sleep(5000)
      // twins arriving AFTER eviction find empty buckets: 7 re-seeds
      // as the new representative (no pair against evicted 0/1), then
      // 8 pairs against 7 — if eviction had NOT happened, the rep
      // would still be 0 and (7,8) could never be emitted
      emit((7L, textX))
      emit((8L, textX))
      assert(await(_.contains((7L, 8L))),
        s"re-seeded bucket did not pair 7-8 (rep leaked across the horizon?): ${pairs()}")
      assert(!pairs().exists(p => p._2 == 7L),
        s"doc 7 paired across the eviction horizon: ${pairs()}")
    } finally q.stop()
  }

  test("streaming heavy hitters: per-micro-batch sketch slices combine to the batch answer") {
    val docs = graft.tables.Tables.documents(spark, sf).select("doc_id", "source", "text")
    val dir = "/tmp/graft_stream_docs"
    // several files + maxFilesPerTrigger=1 → several micro-batches, so
    // the combine step genuinely merges independent slices
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val sink = java.nio.file.Files.createTempDirectory("graft_hh_sink").toString + "/slices"
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamJobs.heavyHitterSketchStream(stream, sink)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(sink).select("batch_id").distinct().count() >= 2,
      "expected multiple micro-batch slices")
    val combined = StreamJobs.heavyHittersFromSlices(spark, sink)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val direct = graft.operators.TextOps.heavyHitters(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(combined == direct,
      s"streamed slices diverged from the single pass: ${combined.diff(direct)} / ${direct.diff(combined)}")
    // crash replay: the same batch's slice lands in the append-only
    // sink twice — combine-on-read must not double-count it
    val one = spark.read.parquet(sink).limit(1)
    one.write.mode("append").parquet(sink)
    val afterReplay = StreamJobs.heavyHittersFromSlices(spark, sink)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(afterReplay == direct, "replayed slice double-counted")
  }

  test("streaming funnel over time-sliced micro-batches reproduces the batch reach exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val steps = Seq("view", "click", "purchase")
    val ev = graft.tables.Tables.events(spark, sf)
    val dir = "/tmp/graft_stream_funnel"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // three arrival slices cut by event time: per-user ts order holds
    // ACROSS micro-batches, the regime the state fold guarantees parity in
    val times = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val (c1, c2) = (times(times.length / 3), times(2 * times.length / 3))
    ev.filter(unix_micros(col("ts")) < c1).write.parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.funnelStream(spark, StreamJobs.eventsStream(spark, dir), steps),
      "funnel_test", mode = "update")
    try {
      ev.filter(unix_micros(col("ts")) >= c1 && unix_micros(col("ts")) < c2)
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      ev.filter(unix_micros(col("ts")) >= c2).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val sunk = spark.table("funnel_test").collect()
      assert(sunk.length > sunk.map(_.getLong(0)).distinct.length,
        "expected per-user updates from more than one micro-batch")
      // latest depth per user (update-mode rows land in batch order)
      val depth = sunk.map(r => r.getLong(0) -> r.getInt(1)).toMap
      val streamedReach = steps.indices.map(i =>
        depth.values.count(_ >= i + 1).toLong)
      val batch = graft.operators.Funnel.funnel(ev, steps).collect()(0)
      val batchReach = steps.indices.map(batch.getLong)
      assert(streamedReach == batchReach,
        s"streamed $streamedReach vs batch $batchReach")
      assert(streamedReach.head > 0)
    } finally q.stop()
  }

  test("streaming aggregate merged into a TxLog table equals the batch aggregate; versions accrue per batch") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import graft.storage.TxLog
    val ev = graft.tables.Tables.events(spark, sf)
    val dir = "/tmp/graft_stream_aggmerge"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val tbl = java.nio.file.Files.createTempDirectory("graft_aggtbl").toString + "/t"
    import spark.implicits._
    val times = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val cut = times(times.length / 2)
    ev.filter(unix_micros(col("ts")) < cut).write.parquet(dir)
    // table exists first, with the aggregate's schema
    TxLog.create(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "wstart BIGINT, event_type STRING, n BIGINT")),
      tbl, Some("event_type"))
    val q = StreamJobs.aggMergeStream(
      StreamJobs.windowCounts(StreamJobs.eventsStream(spark, dir)),
      tbl, Seq("wstart", "event_type"))
    try {
      q.processAllAvailable()
      ev.filter(unix_micros(col("ts")) >= cut).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val merged = TxLog.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.queries.WarehouseQueries.streamWindowCounts(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == batch,
      s"missing ${batch.diff(merged).take(3)}, extra ${merged.diff(batch).take(3)}")
    // one transactional version per non-empty micro-batch, plus create
    assert(TxLog.currentVersion(spark, tbl).exists(_ >= 3L))
  }

  test("streaming ANN ingest: batches append to the existing index, planted twin found between batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.{Ivf, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft_annstream").toString
    val emb = graft.tables.Tables.embeddings(spark, sf)
    val idxPath = s"$root/idx"
    val idx = Ivf.fit(emb, idxPath, nlist = 8)
    // stream source: two batches of NEW vectors — the second plants an
    // exact twin of corpus vector 3 under a fresh id
    val feedDir = s"$root/feed"
    val twin = emb.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val batch1 = emb.filter(col("vec_id") < 5L)
      .select((col("vec_id") + 800000L).as("vec_id"), col("embedding"))
    batch1.write.parquet(feedDir)
    val stream = spark.readStream.schema(batch1.schema).parquet(feedDir)
    val q = StreamJobs.annIngestStream(stream, idx)
    try {
      q.processAllAvailable()
      twin.write.mode("append").parquet(feedDir)
      q.processAllAvailable()
    } finally q.stop()
    // exhaustive probe (nprobe = nlist) is exact brute force over the
    // ingested index: the planted twin must rank at the top for its
    // original's query vector (cosine 1.0 up to float noise)
    val qv = emb.filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val hits = Ivf.query(spark, idx, qv, k = 3, nprobe = 8,
      excludeId = Some(3L)).collect().map(_.getLong(0))
    assert(hits.contains(900003L),
      s"planted twin missing from post-stream index: ${hits.mkString(",")}")
  }

  test("streaming CDC relay: a replica follows the primary's change feed batch by batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.storage.TxLog
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrelay").toString
    val primary = s"$root/primary"; val replica = s"$root/replica"
    val feedDir = s"$root/feed"
    val base = Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0),
      (5L, "p3", 50.0)).toDF("k", "part", "v")
    TxLog.create(base, primary, Some("part"))
    TxLog.mergeInto(primary,
      Seq((2L, "p1", 99.0), (7L, "p3", 70.0)).toDF("k", "part", "v"),
      Seq("k"))                                          // v2
    TxLog.deleteWhere(spark, primary, col("k") === 5L)   // v3
    // replica bootstraps from v1 (a snapshot copy)
    TxLog.create(TxLog.read(spark, primary, Some(1L)), replica, Some("part"))
    // the feed arrives as files: changes(1,2) now, changes(2,3) later
    val c12 = TxLog.changes(spark, primary, 1L, 2L, Seq("k"))
    c12.write.parquet(feedDir)
    val feed = spark.readStream.schema(c12.schema).parquet(feedDir)
    val q = StreamJobs.cdcRelayStream(feed, replica, Seq("k"))
    def replicaRows = TxLog.read(spark, replica)
      .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
    def primaryRows(v: Long) = TxLog.read(spark, primary, Some(v))
      .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
    try {
      q.processAllAvailable()
      assert(replicaRows == primaryRows(2L), "replica should be at v2")
      TxLog.changes(spark, primary, 2L, 3L, Seq("k"))
        .write.mode("append").parquet(feedDir)
      q.processAllAvailable()
      assert(replicaRows == primaryRows(3L), "replica should follow to v3")
    } finally q.stop()
    // one applyChanges commit per non-empty micro-batch, plus create
    assert(TxLog.currentVersion(spark, replica).exists(_ >= 3L))
  }

  test("streaming CDC relay: several version-pairs in ONE micro-batch collapse to last-change-per-key") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.storage.TxLog
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrelay2").toString
    val primary = s"$root/primary"; val replica = s"$root/replica"
    val feedDir = s"$root/feed"
    val base = Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
      .toDF("k", "part", "v")
    TxLog.create(base, primary, Some("part"))
    // v2: update k=2, insert k=7; v3: update k=2 AGAIN and delete k=7 —
    // keys 2 and 7 both change in BOTH pairs, the exact shape a
    // file-tailed feed delivers in one micro-batch when the replica
    // lags (review finding)
    TxLog.mergeInto(primary,
      Seq((2L, "p1", 99.0), (7L, "p3", 70.0)).toDF("k", "part", "v"),
      Seq("k"))                                           // v2
    TxLog.mergeInto(primary,
      Seq((2L, "p1", 111.0)).toDF("k", "part", "v"), Seq("k"))
    TxLog.deleteWhere(spark, primary, col("k") === 7L)    // v3, v4
    TxLog.create(TxLog.read(spark, primary, Some(1L)), replica, Some("part"))
    // publish all three pairs BEFORE the stream starts: one micro-batch
    val head = TxLog.currentVersion(spark, primary).get
    val pairs = (1L until head).map(v =>
      TxLog.changes(spark, primary, v, v + 1, Seq("k"))
        .withColumn("_src_version", lit(v + 1)))
    pairs.reduce(_ unionByName _).write.parquet(feedDir)
    val feed = spark.readStream.schema(pairs.head.schema).parquet(feedDir)
    val q = StreamJobs.cdcRelayStream(feed, replica, Seq("k"),
      versionCol = Some("_src_version"))
    try {
      q.processAllAvailable()
      val got = TxLog.read(spark, replica)
        .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
      val want = TxLog.read(spark, primary)
        .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
      assert(got == want, s"replica $got != primary head $want")
    } finally q.stop()
  }

  test("streaming decay score: re-anchored carry state matches the batch anchor-sum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.tables.Tables.events(spark, sf)
    val dir = "/tmp/graft_stream_decay"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val times = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val cut = times(times.length / 2)
    ev.filter(unix_micros(col("ts")) < cut).write.parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.decayScoreStream(spark, StreamJobs.eventsStream(spark, dir)),
      "decay_test", mode = "update")
    try {
      ev.filter(unix_micros(col("ts")) >= cut).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val sunk = spark.table("decay_test").collect()
      assert(sunk.length > sunk.map(_.getLong(0)).distinct.length,
        "expected per-user updates from more than one micro-batch")
      // latest state per user, re-anchored to the corpus max event time:
      // batch score = stream score · 2^((last − tmax)/halfLife)
      val latest = sunk.map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val tmax = times.last
      val batch = WarehouseQueries.decayScore(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(latest.keySet == batch.keySet)
      latest.foreach { case (u, (last, s)) =>
        val reanchored = s * math.pow(2.0, (last - tmax) / 86400000000.0)
        // the batch side rounds each term through DECIMAL(18,6), so
        // parity is to rounding tolerance, not bit-exact
        assert(math.abs(reanchored - batch(u)) <= 1e-4 * (1 + math.abs(batch(u))),
          s"user $u: streamed $reanchored vs batch ${batch(u)}")
      }
    } finally q.stop()
  }

  test("streaming JSONL ingest: good rows land exactly-once in the TxLog table, corruption quarantines") {
    import graft.sources.Jsonl
    import graft.storage.TxLog
    val root = java.nio.file.Files.createTempDirectory("graft_jsonl_stream")
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val tbl = root.resolve("tbl").toString
    val quar = root.resolve("quar").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, source STRING, text STRING")
    // the table (and its declared schema — the ingest contract) exists first
    TxLog.create(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), tbl, None)
    def file(name: String, lines: String*): Unit =
      java.nio.file.Files.write(src.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
    file("a.jsonl",
      """{"doc_id":1,"source":"web","text":"one"}""",
      """{"doc_id":2,"source":"web","text":"two"}""")
    file("b.jsonl",
      """{"doc_id":3,"source":"api","text":"three"}""",
      "{ broken")
    file("c.jsonl",
      """{"source":"api","text":"no id"}""")
    val q = Jsonl.streamIngestTx(spark, src.toString, schema, Seq("doc_id"),
      tbl, quar, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    // table == the batch reader's good side; quarantine == its bad side
    val (bg, bq) = Jsonl.readJsonl(spark, src.toString, schema, Seq("doc_id"))
    val streamed = TxLog.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == bg.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet)
    assert(streamed.map(_._1) == Set(1L, 2L, 3L))
    // quarantine is a TxLog table too, riding the SAME batch-id watermark
    val quarRows = TxLog.read(spark, quar)
    val quarantined = quarRows.collect()
      .map(r => r.getAs[String]("raw") -> r.getAs[String]("reason")).toSet
    assert(quarantined == bq.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet)
    assert(quarantined.map(_._2) == Set("unparseable", "null_required:doc_id"))
    // one commit per micro-batch rode in; replaying an already-committed
    // batch id is a no-op on BOTH sides — the exactly-once contract
    val v = TxLog.currentVersion(spark, tbl).get
    assert(v >= 3L, s"expected one commit per micro-batch, head v$v")
    TxLog.appendBatch(TxLog.read(spark, tbl).limit(1), tbl, 0L)
    assert(TxLog.currentVersion(spark, tbl).contains(v), "batch replay re-committed")
    val qv = TxLog.currentVersion(spark, quar).get
    val qCount = quarRows.count()
    TxLog.appendBatch(TxLog.read(spark, quar).limit(1), quar, 0L)
    assert(TxLog.currentVersion(spark, quar).contains(qv),
      "quarantine batch replay re-committed")
    assert(TxLog.read(spark, quar).count() == qCount,
      "quarantine batch replay added rows")
    // a LEGACY plain-parquet quarantine dir (pre-exactly-once deploys)
    // must fail loudly, not be silently shadowed by a fresh table that
    // strands the old audit rows outside the documented read path
    val legacy = root.resolve("quar_legacy").toString
    spark.range(3).toDF("old").write.parquet(legacy)
    val eLegacy = intercept[IllegalArgumentException] {
      Jsonl.streamIngestTx(spark, src.toString, schema, Seq("doc_id"),
        tbl, legacy)
    }
    assert(eLegacy.getMessage.contains("legacy"), eLegacy.getMessage)
  }

  test("streaming JSONL ingest routes CHECK violations to quarantine as the ORIGINAL raw line") {
    import graft.sources.Jsonl
    import graft.storage.TxLog
    val root = java.nio.file.Files.createTempDirectory("graft_jsonl_gov")
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val tbl = root.resolve("tbl").toString
    val quar = root.resolve("quar").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, score DOUBLE, text STRING")
    TxLog.create(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), tbl, None)
    TxLog.addConstraint(spark, tbl, "score_pos", "score > 0")
    val badLine = """{"doc_id":2,"score":-0.5,"text":"toxic"}"""
    java.nio.file.Files.write(src.resolve("a.jsonl"), Seq(
      """{"doc_id":1,"score":0.9,"text":"fine"}""",
      badLine,
      "{ broken",
      """{"doc_id":3,"score":null,"text":"null passes CHECK"}"""
    ).mkString("\n").getBytes("UTF-8"))
    val q = Jsonl.streamIngestTx(spark, src.toString, schema, Seq("doc_id"),
      tbl, quar, quarantineViolations = true)
    try q.processAllAvailable() finally q.stop()
    // good: the passing row AND the null-score row (SQL CHECK semantics)
    val got = TxLog.read(spark, tbl).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L), s"governed table got $got")
    // quarantine: the parse failure AND the CHECK violation, the latter
    // as its ORIGINAL line with the constraint named
    val quarantined = TxLog.read(spark, quar).collect()
      .map(r => r.getAs[String]("raw") -> r.getAs[String]("reason")).toSet
    assert(quarantined == Set("{ broken" -> "unparseable",
      badLine -> "check:score_pos"), quarantined.toString)
    // without the flag, the same feed FAILS the batch loudly instead
    val tbl2 = root.resolve("tbl2").toString
    TxLog.create(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), tbl2, None)
    TxLog.addConstraint(spark, tbl2, "score_pos", "score > 0")
    val q2 = Jsonl.streamIngestTx(spark, src.toString, schema, Seq("doc_id"),
      tbl2, root.resolve("quar2").toString)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).map(x => x +: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(_.isInstanceOf[TxLog.ConstraintViolationException]), e.toString)
  }

  test("stateful mapGroupsWithState totals match the batch aggregate") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = StreamJobs.eventsStream(spark, dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.userTotalsStream(spark, stream), "ut_test", mode = "update")
    try {
      val streamed = spark.table("ut_test")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.tables.Tables.events(spark, sf)
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch, "stateful stream diverges from batch counts")
    } finally q.stop()
  }
}
