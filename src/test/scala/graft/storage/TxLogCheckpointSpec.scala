package graft.storage

import graft.SparkSpec

/** The scalable metadata layer: delta commits (O(files changed) JSON),
  * ref commits (O(1) restore), periodic parquet checkpoints, and the
  * resolved-snapshot cache. These specs pin the STORAGE CONTRACT —
  * what lands on disk per commit kind and that resolution reproduces
  * every version exactly with and without its checkpoints.
  */
class TxLogCheckpointSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_ckpt_$tag"
    val f = new java.io.File(d)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)
    d
  }

  private def commitJson(path: String, v: Long) =
    mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_manifests/v$v.json")))

  test("protocol guard: commits record protocol 1; a future-protocol commit refuses to load") {
    import spark.implicits._
    val path = freshDir("protocol")
    TxLog.create(Seq((1L, "a")).toDF("k", "part"), path, Some("part"))
    TxLog.append(Seq((2L, "b")).toDF("k", "part"), path)
    assert(commitJson(path, 1L).get("protocol").asInt() == 1)
    assert(commitJson(path, 2L).get("protocol").asInt() == 1)
    // hand-write a v3 commit claiming a newer format: every read of v3
    // (including head resolution) must refuse with an upgrade message,
    // while the protocol-1 history stays readable
    val node = mapper.createObjectNode()
    node.put("protocol", 99)
    node.put("version", 3L)
    node.putNull("partitionCol")
    node.put("schemaDdl", "k BIGINT")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_manifests/v3.json"),
      mapper.writeValueAsBytes(node))
    TxLog.flushSnapshotCacheForTesting()
    val e = intercept[UnsupportedOperationException] {
      TxLog.read(spark, path).collect()
    }
    assert(e.getMessage.contains("protocol 99"))
    assert(TxLog.read(spark, path, Some(2L)).count() == 2L,
      "older protocol-1 versions must stay readable")
  }

  test("head hint: commits maintain _head; stale, missing or corrupt hints never mis-resolve the head") {
    import spark.implicits._
    val path = freshDir("head_hint")
    TxLog.create(Seq((1L, "a")).toDF("k", "part"), path, Some("part"))
    TxLog.append(Seq((2L, "b")).toDF("k", "part"), path)
    TxLog.append(Seq((3L, "c")).toDF("k", "part"), path)
    val hint = java.nio.file.Paths.get(s"$path/_manifests/_head")
    assert(new String(java.nio.file.Files.readAllBytes(hint)).trim == "3",
      "every commit must refresh the hint")
    // stale hint (a crashed writer's leftover) is a lower bound: the
    // forward probe still finds the true head
    java.nio.file.Files.write(hint, "1".getBytes)
    assert(TxLog.currentVersion(spark, path).contains(3L), "stale hint mis-resolved")
    // corrupt hint falls back to the listing
    java.nio.file.Files.write(hint, "garbage".getBytes)
    assert(TxLog.currentVersion(spark, path).contains(3L), "corrupt hint mis-resolved")
    // missing hint (legacy table) falls back to the listing
    java.nio.file.Files.delete(hint)
    assert(TxLog.currentVersion(spark, path).contains(3L), "missing hint mis-resolved")
    // and the next commit restores it
    TxLog.append(Seq((4L, "d")).toDF("k", "part"), path)
    assert(new String(java.nio.file.Files.readAllBytes(hint)).trim == "4")
  }

  test("data commits are deltas, not file enumerations: commit bytes stay flat as the table grows") {
    import spark.implicits._
    val path = freshDir("delta_commits")
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), path, Some("part"))
    (1 to 15).foreach { i =>
      TxLog.append(Seq((i.toLong, s"p$i", i.toDouble)).toDF("k", "part", "v"), path)
    }
    // v1 is FULL (creation — every file is new anyway); every data
    // commit after it is a DELTA carrying only its own adds
    assert(commitJson(path, 1L).has("files"))
    (2L to 16L).foreach { v =>
      val node = commitJson(path, v)
      assert(!node.has("files") && node.has("add"),
        s"v$v should be a delta commit")
    }
    // the whole point: commit size does NOT grow with table size. The
    // one-partition append at v16 (15 partitions live) serializes the
    // same bytes as the one at v3 (2 live) to within noise
    def size(v: Long) = new java.io.File(s"$path/_manifests/v$v.json").length()
    assert(size(16L) <= size(3L) * 2,
      s"delta at v16 (${size(16L)}B) should not outgrow v3 (${size(3L)}B)")
    // and every version still resolves exactly
    (1L to 16L).foreach { v =>
      val ks = TxLog.read(spark, path, Some(v))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(ks == (0L until v).toSet, s"v$v resolved wrong: $ks")
    }
  }

  test("checkpoints land on the interval, and deleting one only lengthens replay — never changes results") {
    import spark.implicits._
    val path = freshDir("ckpt_replay")
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), path, Some("part"))
    (1 to 21).foreach { i =>
      TxLog.append(Seq((i.toLong, s"p${i % 4}", i.toDouble)).toDF("k", "part", "v"), path)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def ckpt(v: Long) = new org.apache.hadoop.fs.Path(s"$path/_manifests/v$v.ckpt")
    assert(fs.exists(ckpt(10L)) && fs.exists(ckpt(20L)),
      "checkpoints expected at the default interval (10)")
    val headRows = TxLog.read(spark, path)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val v15Rows = TxLog.read(spark, path, Some(15L))
      .select("k").collect().map(_.getLong(0)).toSet
    // a cold reader (cache flushed) resolves v22 from ckpt(20) + 2
    // deltas; with BOTH checkpoints gone it replays the full delta
    // chain from the v1 full commit — identical results either way
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == headRows)
    fs.delete(ckpt(10L), true); fs.delete(ckpt(20L), true)
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == headRows,
      "full delta replay must reproduce the head")
    assert(TxLog.read(spark, path, Some(15L))
      .select("k").collect().map(_.getLong(0)).toSet == v15Rows,
      "time travel must survive checkpoint loss")
  }

  test("checkpoint carries stats and row counts: fastCount and skip pruning work from a cold checkpoint read") {
    import spark.implicits._
    val path = freshDir("ckpt_stats")
    TxLog.create((0L until 20L).map(i => (i, s"p${i % 2}", i * 1.0))
      .toDF("k", "part", "v"), path, Some("part"), statsCols = Seq("k"))
    (1 to 9).foreach { i =>
      TxLog.append(Seq((100L + i, s"p${i % 2}", 0.0)).toDF("k", "part", "v"), path)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifests/v10.ckpt")))
    TxLog.flushSnapshotCacheForTesting()
    // the resolution path is now checkpoint-first: stats/rows must
    // round-trip through the columnar form, not just the JSON
    assert(TxLog.fastCount(spark, path).contains(29L))
    val pruned = TxLog.prunedFiles(spark, path, "k", 105L, 106L)
    val all = TxLog.manifest(spark, path, 10L).files
    assert(pruned.size < all.size,
      s"stats must prune from a checkpoint-resolved snapshot (${pruned.size}/${all.size})")
    val hit = TxLog.readBetween(spark, path, "k", 105L, 106L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(hit == Set(105L, 106L))
  }

  test("restore is a ref commit: O(1) metadata at any table size, still resolves exactly") {
    import spark.implicits._
    val path = freshDir("ref_restore")
    TxLog.create((0L until 12L).map(i => (i, s"p${i % 6}", i * 1.0))
      .toDF("k", "part", "v"), path, Some("part"))
    TxLog.deleteWhere(spark, path, org.apache.spark.sql.functions.col("k") < 6L) // v2
    val v3 = TxLog.restore(spark, path, 1L)
    assert(v3 == 3L)
    val node = commitJson(path, 3L)
    assert(node.has("baseRef") && node.get("baseRef").asLong() == 1L &&
      !node.has("files") && !node.has("add"),
      "restore must write a ref commit")
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path).count() == 12L)
    // and a delta on top of a ref replays cleanly
    TxLog.append(Seq((99L, "p0", 9.0)).toDF("k", "part", "v"), path) // v4
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path).count() == 13L)
  }

  test("vacuum keeps every retained version resolvable: a delta at the cut gets a checkpoint, a ref below the cut survives") {
    import spark.implicits._
    val path = freshDir("vacuum_chain")
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), path, Some("part"))
    (1 to 6).foreach { i =>
      TxLog.append(Seq((i.toLong, s"p$i", i.toDouble)).toDF("k", "part", "v"), path)
    }                                     // v7 head; v5/v6/v7 kept below
    TxLog.vacuum(spark, path, keepVersions = 3)
    // v5 is a delta whose predecessor was dropped: vacuum must have
    // checkpointed it so the chain still grounds
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifests/v5.ckpt")),
      "vacuum must checkpoint the oldest kept delta")
    TxLog.flushSnapshotCacheForTesting()
    (5L to 7L).foreach { v =>
      assert(TxLog.read(spark, path, Some(v)).count() == v,
        s"kept v$v must stay readable after vacuum")
    }
    intercept[IllegalArgumentException] {
      TxLog.read(spark, path, Some(3L)).count()
    }

    // ref-below-the-cut: restore to v5, advance, vacuum past v5 — the
    // kept ref's target is gone, so the ref version itself needs (and
    // gets) a checkpoint
    TxLog.restore(spark, path, 5L)        // v8 = ref(5)
    (1 to 2).foreach { i =>
      TxLog.append(Seq((80L + i, "p0", 0.0)).toDF("k", "part", "v"), path)
    }                                     // v9, v10
    TxLog.vacuum(spark, path, keepVersions = 3) // keeps v8/v9/v10; drops ≤7
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path, Some(8L)).count() == 5L,
      "a kept ref whose target was vacuumed must resolve via its checkpoint")
    assert(TxLog.read(spark, path).count() == 7L)
  }

  test("a table recreated at the same path never serves the dead incarnation's cached snapshots") {
    import spark.implicits._
    val path = freshDir("recreate")
    TxLog.create(Seq((1L, "old")).toDF("k", "tag"), path)
    assert(TxLog.read(spark, path).select("tag").head().getString(0) == "old")
    // drop the table OUT FROM UNDER the log (what a test harness or an
    // external cleaner does), then recreate at the same path
    val f = new java.io.File(path)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    rm(f)
    TxLog.create(Seq((1L, "new")).toDF("k", "tag"), path)
    assert(TxLog.read(spark, path).select("tag").head().getString(0) == "new",
      "create must invalidate the path's snapshot cache")
  }

  test("cache keys are path-canonical: recreate through one spelling invalidates the other") {
    import spark.implicits._
    val path = freshDir("spellings")
    val qualified = s"file:$path" // same table, different spelling
    TxLog.create(Seq((1L, "old")).toDF("k", "tag"), path)
    // warm the cache through the QUALIFIED spelling
    assert(TxLog.read(spark, qualified).select("tag").head().getString(0) == "old")
    val f = new java.io.File(path)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    rm(f)
    // recreate through the BARE spelling — a raw-string cache key
    // would leave "file:/…@1" alive and serve the dead incarnation
    TxLog.create(Seq((1L, "new")).toDF("k", "tag"), path)
    assert(TxLog.read(spark, qualified).select("tag").head().getString(0) == "new",
      "create through '/p' must invalidate cached snapshots keyed 'file:/p'")
  }

  test("a checkpoint failure after the commit landed is swallowed — the commit must not re-run") {
    import spark.implicits._
    val path = freshDir("ckpt_fail")
    TxLog.create(Seq((0L, "seed")).toDF("k", "tag"), path)
    // force maybeCheckpoint itself to throw: a malformed interval conf
    // (NumberFormatException inside the checkpoint path) stands in for
    // disk-full/executor-loss — any of them must NOT surface as a
    // commit failure, because the delta JSON already renamed into
    // place and a retrying caller would double-apply a plain append
    spark.conf.set("graft.txlog.checkpointInterval", "not-a-number")
    try {
      val v = (1 to 10).map(i =>
        TxLog.append(Seq((i.toLong, s"w$i")).toDF("k", "tag"), path)).last
      assert(v == 11L, s"appends did not all land: head $v")
      assert(TxLog.read(spark, path).count() == 11L)
      // and no checkpoint landed (the failure was real, not skipped)
      assert(!new java.io.File(s"$path/_manifests/v10.ckpt").exists())
    } finally spark.conf.unset("graft.txlog.checkpointInterval")
    // with the conf healed, the next interval commit checkpoints again
    (11 to 20).foreach(i =>
      TxLog.append(Seq((i.toLong, s"w$i")).toDF("k", "tag"), path))
    assert(new java.io.File(s"$path/_manifests/v20.ckpt").exists(),
      "interval checkpointing did not recover after the conf was fixed")
  }

  test("setStatsCols: skipping starts with new files, old files stay conservative, OPTIMIZE backfills") {
    import spark.implicits._
    val path = freshDir("set_stats")
    // created WITHOUT stats tracking — the before-query-patterns table
    TxLog.create(Seq((1L, "a"), (2L, "a")).toDF("k", "part"), path, Some("part"))
    assert(TxLog.prunedFiles(spark, path, "k", 100L, 200L).nonEmpty,
      "untracked column must not prune at all")
    intercept[IllegalArgumentException] {
      TxLog.setStatsCols(spark, path, Seq("nope"))
    }
    val v2 = TxLog.setStatsCols(spark, path, Seq("k"))
    TxLog.append(Seq((100L, "a"), (200L, "a")).toDF("k", "part"), path) // v3: has k stats
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.statsCols == Seq("k"))
    // pre-change file has no k entry -> conservatively kept; the range
    // [500, 900] excludes the new file's [100, 200] -> exactly the old
    // file(s) survive the prune
    val pruned = TxLog.prunedFiles(spark, path, "k", 500L, 900L)
    val withStats = m.files.filter(f => m.fileStats.get(f).exists(_.contains("k")))
    assert(withStats.nonEmpty, "appended file must carry k stats")
    assert(pruned.toSet == (m.files.toSet -- withStats),
      s"expected only stat-less files kept, got $pruned")
    // the documented backfill: a full rewrite re-collects under the new set
    TxLog.compact(spark, path, minFilesToCompact = 1)
    val m2 = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m2.files.forall(f => m2.fileStats.get(f).exists(_.contains("k"))),
      "compact must backfill stats for every rewritten file")
    val ops = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(ops(v2) == "SET STATS COLS k", ops.toString)
    // disabling clears entries (resolved state ≡ a replay of the delta)
    TxLog.setStatsCols(spark, path, Nil)
    TxLog.flushSnapshotCacheForTesting()
    val m3 = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m3.statsCols.isEmpty && m3.fileStats.isEmpty)
    // ...and back on through the SQL verb
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' SET STATS COLS (k)")
    assert(TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).statsCols == Seq("k"))
  }

  test("history operation_metrics: row-level deltas per commit, derived retroactively") {
    import spark.implicits._
    val path = freshDir("opmetrics")
    TxLog.create((1L to 10L).map(i => (i, "p", s"v$i")).toDF("k", "part", "v"),
      path, partitionCol = Some("part"))
    TxLog.append((11L to 15L).map(i => (i, "p", s"v$i")).toDF("k", "part", "v"), path)
    TxLog.deleteWhere(spark, path,
      org.apache.spark.sql.functions.expr("k >= 14")) // COW: rewrite minus 2
    TxLog.deleteWhere(spark, path,
      org.apache.spark.sql.functions.expr("k = 1"),
      deletionVectors = true) // DV: 1 row, no file rewrites
    TxLog.updateWhere(spark, path, Seq("v" -> "'upd'"),
      org.apache.spark.sql.functions.expr("k = 2"),
      deletionVectors = true) // DV update: 1 row
    val h = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) ->
        (r.getString(6), r.getMap[String, Long](8).toMap)).toMap
    assert(h(1L)._2("rows_inserted") == 10L, h(1L).toString)
    assert(h(2L)._1 == "APPEND" && h(2L)._2("rows_inserted") == 5L)
    assert(h(3L)._2("rows_deleted") == 2L, h(3L).toString)
    assert(h(4L)._1 == "DELETE (DV)" && h(4L)._2("rows_deleted") == 1L &&
      h(4L)._2("dv_rows_added") == 1L, h(4L).toString)
    assert(h(5L)._1 == "UPDATE (DV)" && h(5L)._2("rows_updated") == 1L &&
      h(5L)._2("rows_written") == 1L, h(5L).toString)
    // every commit carries the generic keys
    h.values.foreach { case (_, m) =>
      assert(m.contains("bytes_added") && m.contains("rows_written"), m.toString) }
    // the SQL TVF serves the same column
    graft.tools.Sql.registerAll(spark, sf)
    val viaSql = spark.sql(
      s"SELECT operation_metrics['rows_deleted'] FROM graft_txlog_history('$path') " +
        "WHERE version = 4").head().getLong(0)
    assert(viaSql == 1L, s"TVF metric $viaSql")
  }

  test("DESCRIBE DETAIL: one-row metadata summary, no data read") {
    import spark.implicits._
    val path = freshDir("detail")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v"),
      path, Some("part"), statsCols = Seq("k"))
    TxLog.addConstraint(spark, path, "v_pos", "v > 0")
    TxLog.addUniqueConstraint(spark, path, "pk_k", Seq("k"))
    val d = TxLog.detail(spark, path).head()
    assert(d.getString(0) == path && d.getLong(1) == 3L)
    assert(d.getString(2) == "part" && d.getLong(3) == 2L)
    assert(d.getLong(4) > 0L, "total_bytes should sum real file sizes")
    assert(d.getLong(5) == 2L, "metadata row count")
    assert(d.getString(6) == "k" && d.getInt(7) == 1 && d.getInt(8) == 1)
    assert(d.getLong(9) == 0L, "no outstanding DV rows yet")
    assert(d.getString(10).contains("part"), d.getString(10))
    // a DV delete surfaces as outstanding rows — the OPTIMIZE advisory
    TxLog.deleteWhere(spark, path,
      org.apache.spark.sql.functions.col("k") === 2L, deletionVectors = true)
    val d2 = TxLog.detail(spark, path).head()
    assert(d2.getLong(9) == 1L && d2.getLong(5) == 1L, d2.toString)
    // ...and as SQL
    assert(spark.sql(
      s"SELECT version, n_dv_rows FROM graft_txlog_detail('$path')")
      .head().getLong(0) == 4L)
  }

  test("AS OF TIMESTAMP: commit times drive versionAt/readAsOf, the TVF, and RESTORE TO TIMESTAMP") {
    import spark.implicits._
    val path = freshDir("asof")
    val t0 = System.currentTimeMillis() - 1
    TxLog.create(Seq((1L, "a")).toDF("k", "part"), path, Some("part")) // v1
    Thread.sleep(25)
    val betweenV1V2 = System.currentTimeMillis()
    Thread.sleep(25)
    TxLog.append(Seq((2L, "b")).toDF("k", "part"), path)               // v2
    assert(TxLog.versionAt(spark, path, betweenV1V2) == 1L)
    assert(TxLog.versionAt(spark, path, System.currentTimeMillis()) == 2L)
    intercept[IllegalArgumentException] {
      TxLog.versionAt(spark, path, t0) // before the table existed
    }
    assert(TxLog.readAsOf(spark, path, betweenV1V2).count() == 1L)
    // history carries monotone commit timestamps
    val ts = TxLog.history(spark, path).collect()
      .sortBy(_.getLong(0)).map(_.getTimestamp(7))
    assert(ts.forall(_ != null) && !ts(1).before(ts(0)), ts.mkString(", "))
    // SQL: the AS-OF TVF and the timestamped restore agree with the API
    val iso = java.time.Instant.ofEpochMilli(betweenV1V2).toString
    assert(spark.sql(s"SELECT * FROM graft_txlog_asof('$path', '$iso')")
      .count() == 1L)
    graft.tools.Sql.exec(spark, s"TXLOG RESTORE '$path' TO TIMESTAMP '$iso'")
    assert(TxLog.read(spark, path).count() == 1L,
      "timestamped restore must land the v1 snapshot")
    assert(TxLog.currentVersion(spark, path).contains(3L))
  }

  test("CREATE OR REPLACE: full redefinition in one commit — new schema/partitioning/stats, history kept, constraints reset") {
    import spark.implicits._
    val path = freshDir("replace_tbl")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    TxLog.addConstraint(spark, path, "v_pos", "v > 0")        // v2
    // redefine: different columns, different partition col, stats on
    val vNew = TxLog.createOrReplace(
      Seq((10L, "x", "2026-01-01"), (20L, "y", "2026-01-02"))
        .toDF("id", "name", "day"),
      path, partitionCol = Some("day"), statsCols = Seq("id"))
    assert(vNew == 3L)
    val head = TxLog.read(spark, path)
    assert(head.columns.toSeq == Seq("id", "name", "day") && head.count() == 2L)
    // old versions keep their own schema and content exactly
    val old = TxLog.read(spark, path, Some(1L))
    assert(old.columns.toSeq == Seq("k", "part", "v") && old.count() == 1L)
    // constraints reset with the new definition; history still shows them
    assert(TxLog.constraintsOf(spark, path).isEmpty)
    assert(TxLog.constraintsOf(spark, path, Some(2L)) == Seq("v_pos" -> "v > 0"))
    TxLog.append(Seq((30L, "z", "2026-01-01")).toDF("id", "name", "day"), path)
    assert(TxLog.read(spark, path).count() == 3L)
    // the new stats set is live: a disjoint range prunes everything
    assert(TxLog.prunedFiles(spark, path, "id", 500L, 900L).isEmpty)
    val ops = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(ops(3L) == "CREATE OR REPLACE", ops.toString)
    // the replace commit is FULL (its file list is wholly new)
    assert(commitJson(path, 3L).has("files"))
    // SQL verb round-trips (and plain CREATE still refuses an existing table)
    intercept[IllegalArgumentException] {
      graft.tools.Sql.exec(spark, s"TXLOG CREATE '$path' AS SELECT 1 AS a")
    }
    graft.tools.Sql.exec(spark,
      s"TXLOG CREATE OR REPLACE '$path' AS SELECT CAST(7 AS BIGINT) AS only_col")
    assert(TxLog.read(spark, path).columns.toSeq == Seq("only_col"))
    assert(TxLog.read(spark, path, Some(1L)).columns.toSeq == Seq("k", "part", "v"),
      "history must survive repeated replaces")
  }

  test("commit provenance: every commit records its operation; history surfaces it, pre-provenance commits read null") {
    import spark.implicits._
    val path = freshDir("provenance")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v"),
      path, Some("part"))                                               // v1
    TxLog.append(Seq((3L, "a", 3.0)).toDF("k", "part", "v"), path)      // v2
    TxLog.mergeInto(path, Seq((1L, "a", 9.0)).toDF("k", "part", "v"),
      Seq("k"))                                                         // v3
    TxLog.addConstraint(spark, path, "v_pos", "v > 0")                  // v4
    TxLog.restore(spark, path, 2L)                                      // v5
    val ops = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(ops(1L) == "CREATE" && ops(2L) == "APPEND" && ops(3L) == "MERGE",
      ops.toString)
    assert(ops(4L) == "ADD CONSTRAINT v_pos" && ops(5L) == "RESTORE TO v2",
      ops.toString)
    // a clone's first commit names its source and version
    val cloneDir = freshDir("provenance_clone")
    TxLog.clone(spark, path, cloneDir)
    val cloneOp = TxLog.history(spark, cloneDir).collect().head.getString(6)
    assert(cloneOp.startsWith("CLONE ") && cloneOp.endsWith(" v5"), cloneOp)
    // strip the field from v2's commit (a pre-provenance writer's
    // commit): history must read null, never fail
    val p = java.nio.file.Paths.get(s"$path/_manifests/v2.json")
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("operation")
    java.nio.file.Files.write(p, mapper.writeValueAsBytes(node))
    // the local FS keeps a checksum sidecar the nio rewrite bypasses
    new java.io.File(s"$path/_manifests/.v2.json.crc").delete()
    val ops2 = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> Option(r.getString(6))).toMap
    assert(ops2(2L).isEmpty && ops2(3L).contains("MERGE"), ops2.toString)
  }

  test("commit timestamps are clamped MONOTONIC: version order and time order always agree") {
    import spark.implicits._
    val path = freshDir("monotonic_ts")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    // rapid-fire commits land within the same millisecond without the
    // clamp; and a skewed writer (commit ts forced into the future)
    // must not let a LATER version carry an EARLIER stamp — versionAt
    // would otherwise resolve a snapshot that includes commits stamped
    // after the requested instant (ADVICE r8, low)
    (0 until 5).foreach(i =>
      TxLog.append(Seq((10L + i, "a", i.toDouble)).toDF("k", "part", "v"), path))
    // simulate a future-skewed writer: restamp the head commit +1h
    val head = TxLog.currentVersion(spark, path).get
    val p = java.nio.file.Paths.get(s"$path/_manifests/v$head.json")
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val skewed = node.get("ts").asLong() + 3600L * 1000
    node.put("ts", skewed)
    java.nio.file.Files.write(p, mapper.writeValueAsBytes(node))
    new java.io.File(s"$path/_manifests/.v$head.json.crc").delete()
    TxLog.flushSnapshotCacheForTesting()
    // the next commit clamps AHEAD of the skewed stamp instead of
    // falling behind it
    TxLog.append(Seq((99L, "a", 9.0)).toDF("k", "part", "v"), path)
    val ts = TxLog.history(spark, path).collect()
      .sortBy(_.getLong(0)).map(_.getTimestamp(7).getTime)
    ts.sliding(2).foreach { case Array(a, b) =>
      assert(a < b, s"non-monotonic commit ts: $a >= $b in ${ts.toSeq}")
    }
    assert(ts.last > skewed, "clamp must ride past the skewed predecessor")
  }

  test("time-based retention: RETAIN HOURS keeps recent versions the version cut would drop") {
    import spark.implicits._
    val path = freshDir("vacuum_hours")
    TxLog.create(Seq((1L, "p0", 1.0), (2L, "p0", 2.0))
      .toDF("k", "part", "v"), path, Some("part"))          // v1
    // the rewrite strands v1's file: vacuumable once v1 leaves retention
    TxLog.deleteWhere(spark, path,
      org.apache.spark.sql.functions.col("k") === 1L)       // v2
    TxLog.append(Seq((3L, "p0", 3.0)).toDF("k", "part", "v"), path) // v3
    // everything committed seconds ago: a 24h horizon must drop NOTHING
    val kept = TxLog.vacuum(spark, path, keepVersions = 1,
      keepHours = Some(24.0))
    assert(kept.isEmpty, s"recent versions must survive the time horizon: $kept")
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path, Some(1L)).count() == 2,
      "v1 must stay time-travelable under the horizon")
    assert(TxLog.read(spark, path).count() == 2)
    // a zero-hour horizon degrades to the pure version cut
    TxLog.vacuum(spark, path, keepVersions = 1, keepHours = Some(0.0))
    TxLog.flushSnapshotCacheForTesting()
    intercept[Exception] { TxLog.read(spark, path, Some(1L)).count() }
    assert(TxLog.read(spark, path).count() == 2)
    // SQL verb: both retention clauses parse together
    val path2 = freshDir("vacuum_hours_sql")
    TxLog.create(Seq((1L, "p0", 1.0)).toDF("k", "part", "v"), path2, Some("part"))
    TxLog.append(Seq((2L, "p0", 2.0)).toDF("k", "part", "v"), path2)
    val out = graft.tools.Sql.exec(spark,
      s"TXLOG VACUUM '$path2' RETAIN 1 VERSIONS RETAIN 24 HOURS DRY RUN")
    assert(out.columns.toSeq == Seq("would_delete"))
  }

  test("vacuum sweeps a CRASHED writer's stale _staging_ dir but never a fresh in-flight one") {
    import spark.implicits._
    val path = freshDir("vacuum_staging")
    TxLog.create(Seq((1L, "p0", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // a crashed append's leftover: full staged batch, two days old
    val dead = new org.apache.hadoop.fs.Path(path, "_staging_deadbeef0000")
    fs.mkdirs(dead)
    val deadFile = new org.apache.hadoop.fs.Path(dead, "part-0.parquet")
    fs.create(deadFile).close()
    // age is the NEWEST recursive mtime — a crashed writer's dir is
    // stale all the way down
    fs.setTimes(deadFile, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    fs.setTimes(dead, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    // a LIVE concurrent writer's staging, written seconds ago
    val live = new org.apache.hadoop.fs.Path(path, "_staging_cafebabe0000")
    fs.mkdirs(live)
    fs.create(new org.apache.hadoop.fs.Path(live, "part-0.parquet")).close()
    TxLog.vacuum(spark, path, keepVersions = 1)
    assert(!fs.exists(dead),
      "a staging dir older than the uncommitted-file retention is leaked garbage")
    assert(fs.exists(live),
      "an in-flight writer's staging dir must survive the sweep")
    // uncommitted leftovers have their OWN floor: an aggressive
    // keepHours=0 legitimately drops old VERSIONS immediately but must
    // never kill a LIVE writer's in-flight staging (r14 advice)
    TxLog.vacuum(spark, path, keepVersions = 1, keepHours = Some(0.0))
    assert(fs.exists(live),
      "a zero-hour horizon must not sweep a FRESH in-flight staging dir")
    // age is the newest mtime found RECURSIVELY: a stale root whose
    // nested partition subdir is still being written stays protected
    val nested = new org.apache.hadoop.fs.Path(path, "_staging_feedface0000")
    val sub = new org.apache.hadoop.fs.Path(nested, "part=p0")
    fs.mkdirs(sub)
    fs.create(new org.apache.hadoop.fs.Path(sub, "part-0.parquet")).close()
    fs.setTimes(nested, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    TxLog.vacuum(spark, path, keepVersions = 1)
    assert(fs.exists(nested),
      "a stale ROOT mtime with a fresh nested write must survive (long-running staged write)")
  }

  test("a torn commit's .tmp manifest is invisible to resolution and vacuums when stale") {
    import spark.implicits._
    val path = freshDir("torn_commit")
    TxLog.create(Seq((1L, "p0", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // a crashed commitAtomic: temp written, rename never happened
    val torn = new org.apache.hadoop.fs.Path(
      s"$path/_manifests/.v2.json.deadbeef.tmp")
    val out = fs.create(torn)
    out.write("{\"version\": 2, \"corrupt\": true".getBytes("UTF-8"))
    out.close()
    // resolution never sees it: head stays v1, reads serve v1
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.currentVersion(spark, path).contains(1L))
    assert(TxLog.read(spark, path).count() == 1L)
    // and the NEXT commit of v2 lands normally despite the leftover
    TxLog.append(Seq((2L, "p0", 2.0)).toDF("k", "part", "v"), path)
    assert(TxLog.currentVersion(spark, path).contains(2L))
    // fresh temp survives the default sweep; stale temp vacuums away
    TxLog.vacuum(spark, path, keepVersions = 1)
    assert(fs.exists(torn), "a fresh temp could be a LIVE committer's")
    fs.setTimes(torn, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    TxLog.vacuum(spark, path, keepVersions = 1)
    assert(!fs.exists(torn), "a stale torn-commit temp is garbage")
  }
}
