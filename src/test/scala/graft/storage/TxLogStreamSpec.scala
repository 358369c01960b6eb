package graft.storage

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec

/** TxLog as a first-class Structured Streaming source (graft-txlog):
  * offsets are commit versions, batches derive from the immutable
  * manifest log. Pins the delivery contract — initial snapshot +
  * exactly-once appends, checkpoint-resume without re-delivery,
  * change-feed rows ≡ TxLog.changes, loud failure on non-append
  * history in append mode, and version-granular rate limiting. */
class TxLogStreamSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_txstream_$tag"
    val f = new java.io.File(d)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)
    d
  }

  private def stream(path: String, opts: (String, String)*) =
    opts.foldLeft(spark.readStream.format("graft-txlog").option("path", path)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  private def keyed(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "cat", "v")
  }

  test("append mode: initial snapshot, then each append exactly once") {
    val path = freshDir("appends")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), path)
    val q = stream(path).writeStream.format("memory")
      .queryName("txs_appends").outputMode("append").start()
    try {
      q.processAllAvailable()
      def got = spark.table("txs_appends").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList.sorted
      assert(got == List((1L, "a", 1.0), (2L, "b", 2.0)),
        "first batch must be the full snapshot")
      TxLog.append(keyed(Seq((3L, "c", 3.0))), path)
      TxLog.append(keyed(Seq((4L, "d", 4.0))), path)
      q.processAllAvailable()
      assert(got == List((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)),
        "appends must arrive exactly once, no re-delivery of the snapshot")
    } finally q.stop()
  }

  test("sinceVersion=latest skips existing content; checkpoint restart resumes without re-delivery") {
    val path = freshDir("resume")
    val ckpt = freshDir("resume_ckpt")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), path)
    val delivered = ArrayBuffer.empty[Row]
    def run() = stream(path, "sinceVersion" -> "latest").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        delivered.synchronized { delivered ++= df.collect() }; ()
      }.start()

    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(delivered.isEmpty, "sinceVersion=latest must not deliver the existing snapshot")
      TxLog.append(keyed(Seq((2L, "b", 2.0))), path)
      q1.processAllAvailable()
      assert(delivered.map(_.getLong(0)).toList == List(2L))
    } finally q1.stop()

    // offline commits + restart from the checkpoint: only the new
    // versions flow, nothing replays
    TxLog.append(keyed(Seq((3L, "c", 3.0))), path)
    val q2 = run()
    try {
      q2.processAllAvailable()
      assert(delivered.map(_.getLong(0)).toList.sorted == List(2L, 3L),
        "restart must resume at the checkpointed version — no duplicates, no gaps")
    } finally q2.stop()
  }

  test("change-feed mode: merge and delete emit the same rows as TxLog.changes") {
    val path = freshDir("cdf")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), path, Some("cat"))
    val q = stream(path, "readChangeFeed" -> "true", "keys" -> "k",
      "sinceVersion" -> "latest").writeStream
      .format("memory").queryName("txs_cdf").outputMode("append").start()
    try {
      TxLog.mergeInto(path, keyed(Seq((2L, "b", 20.0), (3L, "c", 3.0))), Seq("k"))
      q.processAllAvailable()
      def got = spark.table("txs_cdf").collect()
        .map(r => (r.getLong(0), r.getString(3), r.getDouble(2))).toSet
      assert(got == Set((2L, "update", 20.0), (3L, "insert", 3.0)),
        s"merge must surface as update+insert, got $got")
      TxLog.deleteWhere(spark, path, org.apache.spark.sql.functions.col("k") === 1L)
      q.processAllAvailable()
      assert(got == Set((2L, "update", 20.0), (3L, "insert", 3.0), (1L, "delete", 1.0)))
      // the streamed feed ≡ the batch diff over the same range
      val batch = TxLog.changes(spark, path, 1L, 3L, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getString(3), r.getDouble(2))).toSet
      assert(got == batch, "streamed change feed diverges from TxLog.changes")
    } finally q.stop()
  }

  test("KEYLESS streaming CDF: the write-time capture feed, exact preimages per micro-batch") {
    val path = freshDir("cdf_keyless")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), path)   // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                       // v2
    val q = stream(path, "readChangeFeed" -> "true",
      "sinceVersion" -> "latest").writeStream
      .format("memory").queryName("txs_cdf_nk").outputMode("append").start()
    try {
      TxLog.deleteWhere(spark, path,
        org.apache.spark.sql.functions.col("k") === 1L)              // v3
      TxLog.updateWhere(spark, path, Seq("v" -> "v * 10"),
        org.apache.spark.sql.functions.col("k") === 2L)              // v4
      q.processAllAvailable()
      val rows = spark.table("txs_cdf_nk").collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getString(3),
          r.getLong(4))).toSet
      assert(rows == Set(
        (1L, 1.0, "delete", 3L),
        (2L, 2.0, "update_preimage", 4L),
        (2L, 20.0, "update_postimage", 4L)),
        s"keyless streamed feed: $rows")
      // schema carries the commit stamps
      assert(spark.table("txs_cdf_nk").columns.toSeq ==
        Seq("k", "cat", "v", "_change_type", "_commit_version",
          "_commit_timestamp"))
    } finally q.stop()
  }

  test("KEYLESS streaming CDF reads THROUGH a restore: the rollback arrives as events") {
    val path = freshDir("cdf_restore")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), path)   // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                       // v2
    val q = stream(path, "readChangeFeed" -> "true",
      "sinceVersion" -> "latest").writeStream
      .format("memory").queryName("txs_cdf_rst").outputMode("append").start()
    try {
      TxLog.append(keyed(Seq((3L, "c", 3.0))), path)                 // v3
      q.processAllAvailable()
      TxLog.restore(spark, path, 2L)                                 // v4
      TxLog.append(keyed(Seq((4L, "d", 4.0))), path)                 // v5
      q.processAllAvailable()
      val rows = spark.table("txs_cdf_rst").collect()
        .map(r => (r.getLong(0), r.getString(3), r.getLong(4))).toSet
      // the restore's synthesized record flows through the SAME
      // stream — no manual feed restart after a rollback (r16
      // verdict's #1 operational gap)
      assert(rows == Set(
        (3L, "insert", 3L),
        (3L, "delete", 4L),
        (4L, "insert", 5L)),
        s"streamed feed across restore: $rows")
    } finally q.stop()
  }

  test("sinceTimestamp: the tail starts after the version live at that instant") {
    val path = freshDir("since_ts")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), path)          // v1
    Thread.sleep(25)
    val instant = java.time.Instant.now().toString
    Thread.sleep(25)
    TxLog.append(keyed(Seq((2L, "b", 2.0))), path)          // v2, after the instant
    val got = ArrayBuffer.empty[Long]
    val q = stream(path, "sinceTimestamp" -> instant).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(_.getLong(0)); ()
      }.start()
    try {
      q.processAllAvailable()
      TxLog.append(keyed(Seq((3L, "c", 3.0))), path)        // v3, mid-stream
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == Set(2L, 3L),
      s"expected only post-instant commits, got $got")
  }

  test("append mode fails LOUDLY when the range contains a rewrite") {
    val path = freshDir("loud")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), path, Some("cat"))
    val q = stream(path, "sinceVersion" -> "latest").writeStream
      .format("memory").queryName("txs_loud").outputMode("append").start()
    try {
      TxLog.mergeInto(path, keyed(Seq((1L, "a", 10.0))), Seq("k"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def messages(t: Throwable): List[String] =
        if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("append-only")),
        "the appendsSince refusal must surface, not a silent wrong batch")
    } finally q.stop()
  }

  test("CDC replica in ONE streaming job: change-feed source → applyChanges keeps replica ≡ primary") {
    val primary = freshDir("cdc_primary")
    val replica = freshDir("cdc_replica")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), primary, Some("cat"))
    // replica bootstraps from the primary's current snapshot
    TxLog.create(TxLog.read(spark, primary), replica, Some("cat"))
    val q = stream(primary, "readChangeFeed" -> "true", "keys" -> "k",
      "sinceVersion" -> "latest").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        TxLog.applyChanges(replica, df, Seq("k")); ()
      }.start()
    try {
      TxLog.mergeInto(primary, keyed(Seq((2L, "b", 20.0), (3L, "c", 3.0))), Seq("k"))
      q.processAllAvailable()
      TxLog.deleteWhere(spark, primary, org.apache.spark.sql.functions.col("k") === 1L)
      q.processAllAvailable()
      def snap(p: String) = TxLog.read(spark, p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(snap(replica) == snap(primary), "replica diverged from primary head")
      assert(snap(replica) == Set((2L, "b", 20.0), (3L, "c", 3.0)))
    } finally q.stop()
  }

  test("KEYLESS CDC replica in ONE streaming job: event feed → applyChangeEvents, restore included") {
    val primary = freshDir("cdc_keyless_p")
    val replica = freshDir("cdc_keyless_r")
    import spark.implicits._
    // duplicate rows: no key exists — the event feed + multiset apply
    // is the ONLY replication path for this table
    TxLog.create(Seq(("a", 1.0), ("a", 1.0), ("b", 2.0))
      .toDF("k", "v"), primary)                                   // v1
    TxLog.setProperties(spark, primary,
      Map(TxLog.ChangeDataFeedProp -> "true"))                    // v2
    TxLog.create(TxLog.read(spark, primary), replica)
    val q = stream(primary, "readChangeFeed" -> "true",
      "sinceVersion" -> "latest").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        TxLog.applyChangeEvents(replica, df,
          txn = Some(("keyless-relay", id))); ()
      }.start()
    try {
      TxLog.append(Seq(("c", 3.0), ("a", 1.0)).toDF("k", "v"), primary) // v3
      q.processAllAvailable()
      TxLog.deleteWhere(spark, primary,
        org.apache.spark.sql.functions.col("k") === "a")          // v4
      q.processAllAvailable()
      TxLog.restore(spark, primary, 3L)                           // v5: rollback
      q.processAllAvailable()
      def ms(p: String) = TxLog.read(spark, p).groupBy("k", "v").count()
        .collect().map(_.toString).sorted.toSeq
      assert(ms(replica) == ms(primary),
        s"keyless replica diverged: ${ms(replica)} vs ${ms(primary)}")
      // three 'a' copies survive: the restore re-inserted the deleted ones
      assert(TxLog.read(spark, replica)
        .filter(org.apache.spark.sql.functions.col("k") === "a").count() == 3L)
    } finally q.stop()
  }

  test("maxVersionsPerBatch=1: snapshot first, then one commit per batch") {
    val path = freshDir("rate")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), path)
    val batches = ArrayBuffer.empty[Int]
    val q = stream(path, "maxVersionsPerBatch" -> "1").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count().toInt }; ()
      }.start()
    try {
      q.processAllAvailable()
      TxLog.append(keyed(Seq((2L, "b", 2.0))), path)
      TxLog.append(keyed(Seq((3L, "c", 3.0))), path)
      q.processAllAvailable()
      assert(batches.count(_ > 0) == 3, s"expected 3 non-empty batches, got $batches")
      assert(batches.sum == 3)
    } finally q.stop()
  }

  test("maxFilesPerBatch bounds every batch — including the initial snapshot — at file granularity") {
    val path = freshDir("filerate")
    // partitioned by cat → one file per distinct cat, one row each:
    // a 4-file snapshot + a 2-file append must arrive as 6
    // single-file batches, nothing lost, nothing duplicated
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0))), path, Some("cat"))
    val batches = ArrayBuffer.empty[Array[Long]]
    val q = stream(path, "maxFilesPerBatch" -> "1").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.collect().map(_.getLong(0)) }; ()
      }.start()
    try {
      q.processAllAvailable()
      TxLog.append(keyed(Seq((5L, "e", 5.0), (6L, "f", 6.0))), path)
      q.processAllAvailable()
      val nonEmpty = batches.filter(_.nonEmpty)
      assert(nonEmpty.forall(_.length == 1),
        s"every batch must be one file's rows: ${nonEmpty.map(_.toList)}")
      assert(nonEmpty.flatten.sorted.toList == List(1L, 2L, 3L, 4L, 5L, 6L),
        "file-sliced delivery lost or duplicated rows")
    } finally q.stop()
  }

  test("sink: writeStream.format(graft-txlog) auto-creates, commits one version per batch, replays are no-ops") {
    val src = freshDir("sink_src")
    val out = freshDir("sink_out")
    val ckpt = freshDir("sink_ckpt")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), src)
    def run() = stream(src).writeStream
      .format("graft-txlog").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = run()
    try {
      q1.processAllAvailable()
      TxLog.append(keyed(Seq((2L, "b", 2.0))), src)
      q1.processAllAvailable()
    } finally q1.stop()
    def outRows = TxLog.read(spark, out).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(outRows == Set((1L, 1.0), (2L, 2.0)))
    // restart from the same checkpoint: the engine re-offers the last
    // batch; the sink's batch-id watermark must swallow it
    TxLog.append(keyed(Seq((3L, "c", 3.0))), src)
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(outRows == Set((1L, 1.0), (2L, 2.0), (3L, 3.0)),
      "sink must be exactly-once across restarts")
  }

  test("streaming sink + graft.autoCompact: micro-batch small files heal without breaking exactly-once") {
    // THE autoCompact scenario: a streaming sink drips one small file
    // per micro-batch; the declared property heals the table as
    // follow-on OPTIMIZE commits while the sink's batch-id watermark
    // keeps replays no-ops (the heal must not disturb exactly-once)
    val src = freshDir("ac_src")
    val out = freshDir("ac_out")
    val ckpt = freshDir("ac_ckpt")
    TxLog.create(keyed(Seq((0L, "a", 0.0))), src)
    spark.conf.set("graft.txlog.autoCompactMinFiles", "3")
    try {
      val q = stream(src).writeStream
        .format("graft-txlog").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        TxLog.setProperties(spark, out, Map(TxLog.AutoCompactProp -> "true"))
        (1L to 5L).foreach { i =>
          TxLog.append(keyed(Seq((i, "a", i.toDouble))), src)
          q.processAllAvailable()
        }
      } finally q.stop()
      val m = TxLog.manifest(spark, out, TxLog.currentVersion(spark, out).get)
      assert(m.files.size < 5,
        s"streaming small files not healed: ${m.files.size} files")
      import spark.implicits._
      val ops = TxLog.history(spark, out).select("operation")
        .as[String].collect().toSeq
      assert(ops.exists(_.startsWith("OPTIMIZE")),
        s"no follow-on OPTIMIZE in the sink table's history: $ops")
      // content exact: every micro-batch's rows, once each
      assert(TxLog.read(spark, out).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSet ==
        (0L to 5L).map(i => (i, i.toDouble)).toSet,
        "the heal disturbed the sink's exactly-once content")
    } finally spark.conf.unset("graft.txlog.autoCompactMinFiles")
  }

  test("end-to-end incremental ETL: txlog source → transform → txlog sink, exactly-once on both ends") {
    val src = freshDir("e2e_src")
    val out = freshDir("e2e_out")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), src)
    val pipeline = stream(src)
      .filter(org.apache.spark.sql.functions.col("v") > 1.0)
      .withColumn("v2", org.apache.spark.sql.functions.col("v") * 10)
    val q = pipeline.writeStream.format("graft-txlog").option("path", out)
      .option("checkpointLocation", freshDir("e2e_ckpt")).start()
    try {
      q.processAllAvailable()
      TxLog.append(keyed(Seq((3L, "c", 3.0), (4L, "d", 0.5))), src)
      q.processAllAvailable()
      val got = TxLog.read(spark, out).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(got == Set((2L, 20.0), (3L, 30.0)),
        s"derived table diverged from the incremental transform: $got")
      // one append version per delivered micro-batch, snapshot-isolated
      assert(TxLog.currentVersion(spark, out).exists(_ >= 2L))
    } finally q.stop()
  }

  test("skipRewriteCommits: an OPTIMIZE mid-stream is skipped losslessly; appends keep flowing") {
    val path = freshDir("skiprw")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), path)
    val q = stream(path, "sinceVersion" -> "latest", "skipRewriteCommits" -> "true")
      .writeStream.format("memory").queryName("txs_skiprw")
      .outputMode("append").start()
    try {
      TxLog.append(keyed(Seq((2L, "b", 2.0))), path)
      TxLog.append(keyed(Seq((3L, "c", 3.0))), path)
      q.processAllAvailable()
      // compaction rewrites every row it touches — already delivered
      val vOpt = TxLog.compact(spark, path, minFilesToCompact = 2)
      assert(vOpt == 4L, s"compact should commit v4, got v$vOpt")
      TxLog.append(keyed(Seq((5L, "e", 5.0))), path)
      q.processAllAvailable()
      val got = spark.table("txs_skiprw").collect().map(_.getLong(0)).sorted.toList
      assert(got == List(2L, 3L, 5L),
        s"tail must skip the compaction and keep flowing, no dups: $got")
    } finally q.stop()
  }

  test("streaming IVM: the change-feed stream maintains Mv exactly equal to a full recompute") {
    val path = freshDir("ivm")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))),
      path, Some("cat"))
    // view state carried across micro-batches; localCheckpoint cuts
    // the growing lineage the same way Mv's batch driver query does
    var view = Mv.aggregate(TxLog.read(spark, path), Seq("cat"), Seq("v"))
      .localCheckpoint(true)
    val q = stream(path, "readChangeFeed" -> "true", "keys" -> "k",
      "withPreimages" -> "true", "sinceVersion" -> "latest").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        view = Mv.applyDelta(view, batch, Seq("cat"), Seq("v")).localCheckpoint(true)
        ()
      }.start()
    try {
      // an update that MOVES a row between groups (b→a), an insert, a delete
      TxLog.mergeInto(path, keyed(Seq((2L, "a", 20.0), (9L, "c", 9.0))), Seq("k"))
      q.processAllAvailable()
      TxLog.deleteWhere(spark, path, org.apache.spark.sql.functions.col("k") === 3L)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val recomputed = rows(Mv.aggregate(TxLog.read(spark, path), Seq("cat"), Seq("v")))
      assert(rows(view) == recomputed,
        s"maintained view ${rows(view)} diverged from recompute $recomputed")
      assert(recomputed == Set(("a", 2L, 21.0), ("c", 1L, 9.0)),
        s"unexpected head state: $recomputed")
    } finally q.stop()
  }

  test("Trigger.AvailableNow: bounded catch-up to the start-time head, then terminate; restart drains new commits exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val path = freshDir("availnow")
    val ckpt = freshDir("availnow_ckpt")
    TxLog.create(keyed(Seq((1L, "a", 1.0))), path)
    val delivered = ArrayBuffer.empty[Row]
    var batchCount = 0
    def run() = {
      batchCount = 0
      stream(path, "maxVersionsPerBatch" -> "1").writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          delivered.synchronized { delivered ++= df.collect(); batchCount += 1 }
          ()
        }.start()
    }
    def got = delivered.synchronized {
      delivered.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toList.sorted }
    // run 1: the initial snapshot, then STOP on its own (the
    // batch-orchestrated incremental pattern)
    val q1 = run()
    assert(q1.awaitTermination(120000), "AvailableNow query must terminate")
    assert(got == List((1L, "a", 1.0)), s"snapshot run: $got")
    // three commits land while no query is running
    TxLog.append(keyed(Seq((2L, "b", 2.0))), path)
    TxLog.append(keyed(Seq((3L, "c", 3.0))), path)
    TxLog.append(keyed(Seq((4L, "d", 4.0))), path)
    // run 2: drains the delta from the checkpoint to the start-time
    // head — PACED (one commit per micro-batch), then terminates
    val q2 = run()
    assert(q2.awaitTermination(120000), "catch-up run must terminate")
    assert(got == List((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)), s"catch-up must deliver the delta exactly once: $got")
    assert(batchCount == 3,
      s"maxVersionsPerBatch=1 must pace the drain (got $batchCount batches)")
    // run 3: nothing new — delivers nothing, still terminates
    val q3 = run()
    assert(q3.awaitTermination(120000))
    assert(got.size == 4, "an empty catch-up must deliver nothing")
  }

  test("pre-stream rewrite history: the opening snapshot doesn't care that the table was merged before the stream started") {
    val path = freshDir("prehistory")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0))), path, Some("cat"))
    TxLog.mergeInto(path, keyed(Seq((2L, "b", 20.0), (3L, "c", 3.0))), Seq("k"))
    // default start = snapshot of the CURRENT head — a version walk
    // from v1 would trip over the merge; the snapshot must not
    val q = stream(path).writeStream.format("memory")
      .queryName("txs_prehist").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("txs_prehist").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSet
      assert(got == Set((1L, 1.0), (2L, 20.0), (3L, 3.0)),
        s"snapshot after pre-stream merge diverged: $got")
      // and the tail still works after the snapshot
      TxLog.append(keyed(Seq((9L, "z", 9.0))), path)
      q.processAllAvailable()
      assert(spark.table("txs_prehist").count() == 4L)
    } finally q.stop()
  }

  test("DV-bearing snapshot streams with deletes applied; a DV commit mid-tail fails loudly") {
    val path = freshDir("dv")
    TxLog.create(keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))), path)
    // pre-stream DV delete: the opening snapshot is MERGE-ON-READ and
    // must serve the post-delete view, never the resurrected plain scan
    TxLog.deleteWhere(spark, path,
      org.apache.spark.sql.functions.col("k") === 2L, deletionVectors = true)
    val q = stream(path).writeStream.format("memory")
      .queryName("txs_dv").outputMode("append").start()
    try {
      q.processAllAvailable()
      def got = spark.table("txs_dv").collect().map(_.getLong(0)).toList.sorted
      assert(got == List(1L, 3L),
        s"snapshot must apply deletion vectors, got $got")
      // plain appends after the DV commit tail fine
      TxLog.append(keyed(Seq((4L, "d", 4.0))), path)
      q.processAllAvailable()
      assert(got == List(1L, 3L, 4L))
      // a DV delete MID-TAIL changes rows without adding files — the
      // file-granular tail must fail LOUDLY (silently continuing would
      // never retract the deleted row downstream)
      TxLog.deleteWhere(spark, path,
        org.apache.spark.sql.functions.col("k") === 1L, deletionVectors = true)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("deletion vectors"))),
        s"expected the DV tail refusal, got: ${e.getMessage}")
    } finally q.stop()
  }
}
