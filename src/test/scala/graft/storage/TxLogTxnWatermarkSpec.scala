package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-app transaction watermarks — `appendTxn` / `txnVersion`
  * (Delta's SetTransaction): each writer app gets its own exactly-once
  * lane into one table. A replayed delivery (same app, same-or-older
  * version) is SKIPPED before staging data; every other commit shape
  * carries the map forward, so maintenance interleaved between a
  * delivery and its crash-replay cannot defeat the check; the first
  * watermark raises minWriter to 3 (an older writer generation would
  * drop the map on its next commit).
  */
class TxLogTxnWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txnw_$tag").toString + "/tbl"

  test("replayed (appId, version) deliveries are skipped exactly-once") {
    val path = freshPath("replay")
    TxLog.create(Seq((1L, "base")).toDF("k", "src"), path)
    val v2 = TxLog.appendTxn(Seq((2L, "b1")).toDF("k", "src"), path, "loader", 1L)
    assert(v2 == 2L)
    assert(TxLog.txnVersion(spark, path, "loader").contains(1L))
    // exact replay: no new version, no new rows
    val r = TxLog.appendTxn(Seq((2L, "b1")).toDF("k", "src"), path, "loader", 1L)
    assert(r == 2L, "replay must return the unchanged head")
    assert(TxLog.read(spark, path).count() == 2)
    // a STALE replay (older than the watermark) is skipped too
    assert(TxLog.appendTxn(Seq((9L, "old")).toDF("k", "src"),
      path, "loader", 0L) == 2L)
    assert(TxLog.read(spark, path).count() == 2)
    // the next increment commits
    TxLog.appendTxn(Seq((3L, "b2")).toDF("k", "src"), path, "loader", 2L)
    assert(TxLog.txnVersion(spark, path, "loader").contains(2L))
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("independent apps keep independent watermarks") {
    val path = freshPath("apps")
    TxLog.create(Seq((1L, "base")).toDF("k", "src"), path)
    TxLog.appendTxn(Seq((2L, "a")).toDF("k", "src"), path, "app_a", 5L)
    // app_b at version 1 is NOT gated by app_a's 5
    TxLog.appendTxn(Seq((3L, "b")).toDF("k", "src"), path, "app_b", 1L)
    assert(TxLog.read(spark, path).count() == 3)
    assert(TxLog.txnVersion(spark, path, "app_a").contains(5L))
    assert(TxLog.txnVersion(spark, path, "app_b").contains(1L))
    assert(TxLog.txnVersion(spark, path, "app_c").isEmpty)
  }

  test("the first watermark raises minWriter to 3; plain tables stay put") {
    val path = freshPath("gate")
    TxLog.create(Seq((1L, "x")).toDF("k", "src"), path)
    assert(TxLog.manifest(spark, path, 1L).minWriter == 1)
    TxLog.appendTxn(Seq((2L, "y")).toDF("k", "src"), path, "app", 1L)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.minWriter == 3,
      "a table carrying txn watermarks must refuse writer generations " +
        s"that would drop them (got minWriter ${m.minWriter})")
  }

  test("every other commit shape carries the map; the replay door stays shut") {
    val path = freshPath("carry")
    TxLog.create(Seq((1L, "base", 1.0)).toDF("k", "src", "w"), path)
    TxLog.appendTxn(Seq((2L, "b1", 2.0)).toDF("k", "src", "w"),
      path, "loader", 1L)
    // interleave a plain append, a compaction, a schema evolution and
    // a restore — the crash-replay of batch 1 must STILL be skipped
    TxLog.append(Seq((3L, "plain", 3.0)).toDF("k", "src", "w"), path)
    TxLog.compact(spark, path)
    TxLog.addColumn(spark, path, "note", "string")
    assert(TxLog.txnVersion(spark, path, "loader").contains(1L),
      "append/compact/alter must carry the watermark forward")
    val head = TxLog.currentVersion(spark, path).get
    TxLog.restore(spark, path, head - 1)
    assert(TxLog.txnVersion(spark, path, "loader").contains(1L),
      "restore must carry the HEAD's watermark")
    val before = TxLog.read(spark, path).count()
    TxLog.appendTxn(Seq((2L, "b1", 2.0)).toDF("k", "src", "w"),
      path, "loader", 1L) // the crash replay
    assert(TxLog.read(spark, path).count() == before,
      "replay after interleaved maintenance must not double-append")
  }

  test("watermarks survive checkpoint-based resolution and a cold cache") {
    val path = freshPath("ckpt")
    spark.conf.set("graft.txlog.checkpointInterval", "4")
    try {
      TxLog.create(Seq((0L, "base")).toDF("k", "src"), path)
      TxLog.appendTxn(Seq((1L, "t")).toDF("k", "src"), path, "app", 7L)
      // push past a checkpoint boundary
      (2L to 5L).foreach(i =>
        TxLog.append(Seq((i, "fill")).toDF("k", "src"), path))
      TxLog.flushSnapshotCacheForTesting()
      assert(TxLog.txnVersion(spark, path, "app").contains(7L),
        "resolution from checkpoint + deltas must surface the watermark")
    } finally spark.conf.unset("graft.txlog.checkpointInterval")
  }

  test("a clone starts fresh lanes; CREATE OR REPLACE keeps them") {
    val path = freshPath("clone_src")
    val tgt = freshPath("clone_tgt")
    TxLog.create(Seq((1L, "x")).toDF("k", "src"), path)
    TxLog.appendTxn(Seq((2L, "y")).toDF("k", "src"), path, "app", 3L)
    TxLog.clone(spark, path, tgt)
    assert(TxLog.txnVersion(spark, tgt, "app").isEmpty,
      "a clone is a new table — its ingest apps restart their lanes")
    TxLog.createOrReplace(Seq((9L, "z")).toDF("k", "src"), path)
    assert(TxLog.txnVersion(spark, path, "app").contains(3L),
      "REPLACE redefines data, not delivery history")
  }

  test("two streams into one table: each app's lane is exactly-once, neither gates the other") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = freshPath("streams")
    TxLog.create(Seq((0L, "seed")).toDF("k", "src"), path)
    val msA = MemoryStream[Long](spark)
    val msB = MemoryStream[Long](spark)
    val ckA = java.nio.file.Files.createTempDirectory("graft_txnw_ckA").toString
    val ckB = java.nio.file.Files.createTempDirectory("graft_txnw_ckB").toString
    val qA = TxLog.streamAppendTxn(
      msA.toDF().select(col("value").as("k"), lit("a").as("src")),
      path, "stream_a", Some(ckA))
    val qB = TxLog.streamAppendTxn(
      msB.toDF().select(col("value").as("k"), lit("b").as("src")),
      path, "stream_b", Some(ckB))
    try {
      msA.addData(1L, 2L); qA.processAllAvailable()
      msB.addData(10L); qB.processAllAvailable()
      // stream A is several batches ahead — stream B's NEXT batch
      // must still land (the single-watermark design would skip it)
      msA.addData(3L); qA.processAllAvailable()
      msA.addData(4L); qA.processAllAvailable()
      msB.addData(11L); qB.processAllAvailable()
    } finally { qA.stop(); qB.stop() }
    val out = TxLog.read(spark, path)
    assert(out.filter(col("src") === "a").select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 4L))
    assert(out.filter(col("src") === "b").select("k").as[Long]
      .collect().toSet == Set(10L, 11L))
    // both lanes advanced independently
    assert(TxLog.txnVersion(spark, path, "stream_a").exists(_ >= 2L))
    assert(TxLog.txnVersion(spark, path, "stream_b").exists(_ >= 1L))
  }

  test("SQL verb: TXLOG APPEND INTO ... TXN replays idempotently") {
    val path = freshPath("sqltxn")
    TxLog.create(Seq((1L, "x")).toDF("k", "src"), path)
    Seq((2L, "y")).toDF("k", "src").createOrReplaceTempView("txn_src")
    val stmt =
      s"TXLOG APPEND INTO '$path' TXN ('sqlapp', 1) SELECT * FROM txn_src"
    graft.tools.Sql.exec(spark, stmt)
    graft.tools.Sql.exec(spark, stmt) // the crash replay
    assert(TxLog.read(spark, path).count() == 2, "replay must not double-append")
    assert(TxLog.txnVersion(spark, path, "sqlapp").contains(1L))
    // the plain APPEND form still dispatches (no regex shadowing)
    graft.tools.Sql.exec(spark,
      s"TXLOG APPEND INTO '$path' SELECT * FROM txn_src")
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("SQL: graft_txlog_txns lists the lanes") {
    val path = freshPath("tvf")
    TxLog.create(Seq((1L, "x")).toDF("k", "src"), path)
    TxLog.appendTxn(Seq((2L, "y")).toDF("k", "src"), path, "nightly", 42L)
    TxLog.appendTxn(Seq((3L, "z")).toDF("k", "src"), path, "backfill", 7L)
    val rows = spark.sql(s"SELECT * FROM graft_txlog_txns('$path') ORDER BY app_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("backfill", 7L), ("nightly", 42L)))
  }

  test("merge verbs and applyChanges ride the same lanes: replayed CDC windows skip") {
    val path = freshPath("cdc")
    TxLog.create(Seq((1L, "p", 10.0), (2L, "p", 20.0)).toDF("k", "part", "amt"),
      path, Some("part"))
    val upd = Seq((1L, "p", 11.0), (3L, "p", 30.0)).toDF("k", "part", "amt")
    TxLog.mergeInto(path, upd, Seq("k"), txn = Some("cdc" -> 1L))
    val after = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(after == Seq((1L, "p", 11.0), (2L, "p", 20.0), (3L, "p", 30.0)))
    val headV = TxLog.currentVersion(spark, path).get
    // crash replay of the same window: no new version, same rows
    assert(TxLog.mergeInto(path, upd, Seq("k"), txn = Some("cdc" -> 1L)) == headV)
    assert(TxLog.read(spark, path).count() == 3)
    // mergeWhen on the next window commits; its replay skips
    TxLog.mergeWhen(path, Seq((2L, "p", 99.0)).toDF("k", "part", "amt"),
      Seq("k"),
      matched = Seq(TxLog.MergeClause(None, "update", Seq("amt" -> "src.amt"))),
      txn = Some("cdc" -> 2L))
    val v2 = TxLog.currentVersion(spark, path).get
    assert(TxLog.mergeWhen(path, Seq((2L, "p", 77.0)).toDF("k", "part", "amt"),
      Seq("k"),
      matched = Seq(TxLog.MergeClause(None, "update", Seq("amt" -> "src.amt"))),
      txn = Some("cdc" -> 2L)) == v2, "replayed window must not re-apply")
    assert(TxLog.read(spark, path).filter(col("k") === 2L)
      .select("amt").as[Double].head() == 99.0)
    // applyChanges: a replayed feed window skips whole
    val feed = Seq((3L, "p", 33.0, "update"), (2L, "p", 0.0, "delete"))
      .toDF("k", "part", "amt", "_change_type")
    TxLog.applyChanges(path, feed, Seq("k"), txn = Some("relay" -> 10L))
    val v3 = TxLog.currentVersion(spark, path).get
    assert(TxLog.applyChanges(path, feed, Seq("k"),
      txn = Some("relay" -> 10L)) == v3)
    assert(TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "p", 11.0), (3L, "p", 33.0)))
    assert(TxLog.txnVersion(spark, path, "cdc").contains(2L))
    assert(TxLog.txnVersion(spark, path, "relay").contains(10L))
  }

  test("a no-op mergeWhen still seals the watermark — replay cannot re-apply") {
    import graft.storage.TxLog.MergeClause
    val path = freshPath("noopseal")
    TxLog.create(Seq((1L, "base")).toDF("k", "v"), path)
    // delivery 1: key 9 matches nothing and there is no INSERT clause —
    // zero data change, but the lane must seal anyway: the table can
    // change before a redelivery, and an unsealed lane would let the
    // replay apply effects the original did not
    val d1 = Seq((9L, "d1")).toDF("k", "v")
    val clauses = Seq(MergeClause(None, "update", Seq("v" -> "src.v")))
    TxLog.mergeWhen(path, d1, Seq("k"), matched = clauses,
      txn = Some("cdc" -> 1L))
    assert(TxLog.txnVersion(spark, path, "cdc").contains(1L),
      "no-op merge must record the per-app watermark (SetTransaction)")
    // interleaved writer: key 9 now exists
    TxLog.append(Seq((9L, "late")).toDF("k", "v"), path)
    // crash-replay of delivery 1 must be SKIPPED, not update k=9
    TxLog.mergeWhen(path, d1, Seq("k"), matched = clauses,
      txn = Some("cdc" -> 1L))
    val got = TxLog.read(spark, path).filter(col("k") === 9L)
      .select("v").as[String].head()
    assert(got == "late",
      s"replayed no-op merge re-applied against the changed table: '$got'")
    // the DV form seals its no-op lane the same way
    TxLog.mergeWhen(path, Seq((77L, "x")).toDF("k", "v"), Seq("k"),
      matched = clauses, deletionVectors = true, txn = Some("dv" -> 1L))
    assert(TxLog.txnVersion(spark, path, "dv").contains(1L))
  }

  test("a no-op applyChanges still seals the watermark") {
    val path = freshPath("acseal")
    TxLog.create(Seq((1L, "p", 1.0)).toDF("k", "part", "amt"), path,
      partitionCol = Some("part"))
    // feed touches no existing key and carries no upserts
    val feed = Seq((9L, "p", 0.0, "delete")).toDF("k", "part", "amt", "_change_type")
    val v = TxLog.applyChanges(path, feed, Seq("k"), txn = Some("relay" -> 3L))
    assert(TxLog.txnVersion(spark, path, "relay").contains(3L),
      s"no-op applyChanges must seal (committed v$v)")
  }

  test("constraints still vet idempotent appends") {
    val path = freshPath("check")
    TxLog.create(Seq((1L, "x")).toDF("k", "src"), path)
    TxLog.addConstraint(spark, path, "k_pos", "k > 0")
    intercept[TxLog.ConstraintViolationException] {
      TxLog.appendTxn(Seq((-5L, "bad")).toDF("k", "src"), path, "app", 1L)
    }
    // the refused delivery did NOT consume the watermark
    assert(TxLog.txnVersion(spark, path, "app").isEmpty)
    TxLog.appendTxn(Seq((5L, "good")).toDF("k", "src"), path, "app", 1L)
    assert(TxLog.read(spark, path).count() == 2)
  }
}
