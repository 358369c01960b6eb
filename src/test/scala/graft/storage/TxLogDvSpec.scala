package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion vectors — `deleteWhere(deletionVectors = true)`: a delete
  * as METADATA + a delete-sized sidecar, zero data-file changes. These
  * specs pin the economics (files byte-identical), the single read
  * seam (merges/probes/CDF/compaction all see the post-delete view),
  * materialization via OPTIMIZE, accumulation across deletes,
  * fastCount arithmetic, the append-tail refusal, protocol-2 reader
  * gating, and vacuum GC of superseded sidecars.
  */
class TxLogDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dv_$tag").toString + "/tbl"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select("k", "part", "v").as[(Long, String, Double)].collect().toSet

  private def fixture = Seq(
    (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0), (4L, "p2", 40.0)
  ).toDF("k", "part", "v")

  test("DV delete: zero file changes, rows gone, fastCount exact, time travel intact, deletes accumulate") {
    val path = freshPath("basic")
    TxLog.create(fixture, path, Some("part"))
    val m1 = TxLog.manifest(spark, path, 1L)
    def fileState(rel: String): (Long, Long) = {
      val f = new java.io.File(s"$path/data/$rel"); (f.length, f.lastModified)
    }
    val before = m1.files.map(f => f -> fileState(f)).toMap
    val v2 = TxLog.deleteWhere(spark, path, col("k") === 2L,
      deletionVectors = true)
    assert(v2 == 2L)
    val m2 = TxLog.manifest(spark, path, 2L)
    // the whole point: the FILE SET is untouched, bytes never move
    assert(m2.files == m1.files, "DV delete must not change the file set")
    m1.files.foreach(f => assert(fileState(f) == before(f), s"$f moved"))
    assert(m2.dv.size == 1 && m2.dv.head._2.values.sum == 1L, m2.dv.toString)
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
    // metadata-only count subtracts the DV rows
    assert(TxLog.fastCount(spark, path).contains(3L))
    // time travel: the pre-delete version still reads the row
    assert(rows(TxLog.read(spark, path, Some(1L))) == rows(fixture))
    // a second DV delete accumulates (and cannot re-delete the same row)
    TxLog.deleteWhere(spark, path, col("k") <= 3L, deletionVectors = true)
    val m3 = TxLog.manifest(spark, path, 3L)
    assert(m3.dv.flatMap(_._2.values).sum == 3L, m3.dv.toString)
    assert(rows(TxLog.read(spark, path)) == Set((4L, "p2", 40.0)))
    assert(TxLog.fastCount(spark, path).contains(1L))
    // history records the DV commit kind
    val ops = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(ops(2L) == "DELETE (DV)", ops.toString)
  }

  test("one read seam: merge, UNIQUE probe, CDF and compaction all see the post-delete view") {
    val path = freshPath("seam")
    TxLog.create(fixture, path, Some("part"))
    TxLog.deleteWhere(spark, path, col("k") === 2L, deletionVectors = true)
    // a merge re-inserting the DV-deleted key: the anti-join side
    // (hit rows) must NOT contain the deleted row, so the new row wins
    // cleanly and the deleted one stays gone
    TxLog.mergeInto(path, Seq((2L, "p1", -2.0)).toDF("k", "part", "v"), Seq("k"))
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "p1", 10.0), (2L, "p1", -2.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
    // CDF across the DV delete: exactly one delete row
    val feed = TxLog.changes(spark, path, 1L, 2L, Seq("k"))
    val byKey = feed.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("_change_type")).toMap
    assert(byKey == Map(2L -> "delete"), byKey.toString)
    // UNIQUE gate: inserting a key that only a DV-deleted row held is
    // NOT a collision
    val path2 = freshPath("seam_unique")
    TxLog.create(fixture, path2, Some("part"))
    TxLog.addUniqueConstraint(spark, path2, "pk_k", Seq("k"))
    TxLog.deleteWhere(spark, path2, col("k") === 3L, deletionVectors = true)
    TxLog.append(Seq((3L, "p2", 33.0)).toDF("k", "part", "v"), path2)
    assert(TxLog.read(spark, path2).filter("k = 3").head().getDouble(2) == 33.0)
    // ...and a key still live DOES collide
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((1L, "p1", 0.0)).toDF("k", "part", "v"), path2)
    }
  }

  test("OPTIMIZE materializes DVs: state prunes to empty, rows stay gone, vacuum GCs the sidecar") {
    val path = freshPath("optimize")
    TxLog.create(fixture, path, Some("part"))
    TxLog.deleteWhere(spark, path, col("k") === 2L, deletionVectors = true)
    assert(TxLog.manifest(spark, path, 2L).dv.nonEmpty)
    // rewrite every partition (threshold 1): the compaction reads the
    // filtered view, so the rewritten files exclude the deleted row and
    // the carried DV state prunes to empty
    val v3 = TxLog.compact(spark, path, minFilesToCompact = 1)
    val m3 = TxLog.manifest(spark, path, v3)
    assert(m3.dv.isEmpty, s"DV state should materialize away: ${m3.dv}")
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
    assert(TxLog.fastCount(spark, path).contains(3L))
    // the sidecar survives while v2 is retained...
    val dvDirs = Option(new java.io.File(s"$path/_dv").listFiles())
      .getOrElse(Array.empty)
    assert(dvDirs.nonEmpty, "sidecar gone while v2 still retained")
    // ...and vacuums away with it
    TxLog.vacuum(spark, path, keepVersions = 1)
    val after = Option(new java.io.File(s"$path/_dv").listFiles())
      .getOrElse(Array.empty)
    assert(after.isEmpty, s"vacuum left DV sidecars: ${after.mkString(",")}")
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
  }

  test("rebase refuses across a concurrent DV change: pre-DV rewrites and racing DV adds recompute") {
    // a DV delete changes ROWS without changing FILES — the file-set
    // rebase comparison alone would wave a stale rewrite through and
    // RESURRECT the concurrently-deleted rows (r9 advice, high)
    val path = freshPath("dvrace")
    TxLog.create(fixture, path, Some("part"))
    val base = TxLog.manifest(spark, path, 1L)
    // the rewrite stages its files from the PRE-DV snapshot...
    val staged = TxLog.stageIn(
      TxLog.read(spark, path, Some(1L)).filter(col("part") === "p1"),
      path, Seq("part"))
    // ...then a DV delete lands first (v2): no files changed, one row gone
    TxLog.deleteWhere(spark, path, col("k") === 1L, deletionVectors = true)
    // the stale rewrite must NOT rebase cleanly — it would carry k=1 back
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base, rewriteDirs = Set("part=p1"),
        newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
        readSet = Some(Set("part=p1")), operation = "OPTIMIZE")
    }
    // racing DV adds conflict too (double-carried delete counts otherwise)
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
        newFiles = Nil, schemaDdl = base.schemaDdl, batchId = None,
        readSet = None, operation = "DELETE (DV)",
        addDv = Seq("phantom.dv" -> Map(base.files.head -> 1L)))
    }
    // a blind APPEND staged pre-DV is still safe to rebase: it touches
    // no existing file and carries no DV state
    val appended = TxLog.stageIn(
      Seq((8L, "p1", 80.0)).toDF("k", "part", "v"), path, Seq("part"))
    val v3 = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = appended, schemaDdl = base.schemaDdl, batchId = None,
      readSet = Some(Set.empty), operation = "APPEND")
    assert(v3 == 3L)
    assert(rows(TxLog.read(spark, path)) ==
      Set((2L, "p1", 20.0), (3L, "p2", 30.0), (4L, "p2", 40.0), (8L, "p1", 80.0)))
  }

  test("compact materializes DVs in single-file directories: the advertised remedy is never a no-op") {
    // the batch relation's refusal message says "run TxLog.compact to
    // materialize" — that must hold even when the DV's target dir is
    // below the minFilesToCompact threshold (r9 advice, low)
    val path = freshPath("dvsingle")
    TxLog.create(fixture.coalesce(1), path) // ONE file, unpartitioned
    assert(TxLog.manifest(spark, path, 1L).files.size == 1)
    TxLog.deleteWhere(spark, path, col("k") === 2L, deletionVectors = true)
    assert(TxLog.manifest(spark, path, 2L).dv.nonEmpty)
    val v3 = TxLog.compact(spark, path) // default threshold (2) — still compacts
    assert(v3 == 3L, "compact was a no-op on a DV-bearing single-file dir")
    val m3 = TxLog.manifest(spark, path, v3)
    assert(m3.dv.isEmpty, s"DV state should materialize away: ${m3.dv}")
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
    // and the batch relation now mounts the table
    val viaFormat = spark.read.format("graft-txlog").option("path", path).load()
    assert(rows(viaFormat) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
  }

  test("MERGE-ON-READ: DV merge leaves old files untouched, updates win, inserts land, OPTIMIZE materializes") {
    val path = freshPath("merge")
    TxLog.create(fixture, path, Some("part"))
    val m1 = TxLog.manifest(spark, path, 1L)
    def fileState(rel: String): (Long, Long) = {
      val f = new java.io.File(s"$path/data/$rel"); (f.length, f.lastModified)
    }
    val before = m1.files.map(f => f -> fileState(f)).toMap
    // update key 2 + insert key 9, as a DV merge
    TxLog.mergeInto(path,
      Seq((2L, "p1", -2.0), (9L, "p2", 90.0)).toDF("k", "part", "v"),
      Seq("k"), deletionVectors = true)
    val m2 = TxLog.manifest(spark, path, 2L)
    // every ORIGINAL file still in the manifest, byte-identical; the
    // update+insert appended as new files
    assert(m1.files.toSet.subsetOf(m2.files.toSet),
      "DV merge must not drop original files")
    m1.files.foreach(f => assert(fileState(f) == before(f), s"$f moved"))
    assert(m2.dv.flatMap(_._2.values).sum == 1L, m2.dv.toString)
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "p1", 10.0), (2L, "p1", -2.0), (3L, "p2", 30.0),
        (4L, "p2", 40.0), (9L, "p2", 90.0)))
    assert(TxLog.fastCount(spark, path).contains(5L))
    // a pure-insert DV merge writes no sidecar at all
    TxLog.mergeInto(path, Seq((10L, "p1", 100.0)).toDF("k", "part", "v"),
      Seq("k"), deletionVectors = true)
    assert(TxLog.manifest(spark, path, 3L).dv.flatMap(_._2.values).sum == 1L)
    // CDF across the DV merge: one update, one insert
    val feed = TxLog.changes(spark, path, 1L, 2L, Seq("k"))
    val byKey = feed.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("_change_type")).toMap
    assert(byKey == Map(2L -> "update", 9L -> "insert"), byKey.toString)
    // materialize: DV state drains, result identical
    val want = rows(TxLog.read(spark, path))
    TxLog.compact(spark, path, minFilesToCompact = 1)
    val head = TxLog.currentVersion(spark, path).get
    assert(TxLog.manifest(spark, path, head).dv.isEmpty)
    assert(rows(TxLog.read(spark, path)) == want)
    val ops = TxLog.history(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(ops(2L) == "MERGE (DV)", ops.toString)
  }

  test("DV commits gate old readers (protocol 2) and refuse the file-level append tail") {
    val path = freshPath("gate")
    TxLog.create(fixture, path, Some("part"))
    TxLog.deleteWhere(spark, path, col("k") === 1L, deletionVectors = true)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_manifests/v2.json")), "UTF-8")
    assert(txt.contains("\"protocol\" : 2"),
      "a pre-DV reader would resurrect deleted rows — must refuse")
    // file-level increments are row-inaccurate across a DV commit
    val e = intercept[IllegalArgumentException] {
      TxLog.appendsSince(spark, path, 1L)
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // the batch relation applies DVs at scan time (the DV-aware format)
    // — a mount of the DV-bearing head serves the post-delete view,
    // row-for-row with TxLog.read, never the resurrected plain scan
    val mounted = spark.read.format("graft-txlog").option("path", path).load()
    assert(rows(mounted) == rows(TxLog.read(spark, path)))
    assert(mounted.count() == 3)
    // the version BEFORE the DV commit still serves through the format
    assert(spark.read.format("graft-txlog").option("path", path)
      .option("versionAsOf", "1").load().count() == 4)
    // but appends AFTER the DV commit tail fine from v2
    TxLog.append(Seq((9L, "p1", 90.0)).toDF("k", "part", "v"), path)
    assert(TxLog.appendsSince(spark, path, 2L).count() == 1)
  }

  test("shallow clone carries DV state by reference; deep clone is self-contained") {
    val src = freshPath("clone_src")
    TxLog.create(fixture, src, Some("part"))
    TxLog.deleteWhere(spark, src, col("k") === 2L, deletionVectors = true)
    val shallow = freshPath("clone_shallow")
    TxLog.clone(spark, src, shallow)
    assert(rows(TxLog.read(spark, shallow)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
    assert(TxLog.fastCount(spark, shallow).contains(3L))
    val deep = freshPath("clone_deep")
    TxLog.clone(spark, src, deep, deep = true)
    assert(rows(TxLog.read(spark, deep)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
    // deep clone survives source deletion entirely
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    rm(new java.io.File(src).getParentFile)
    TxLog.flushSnapshotCacheForTesting()
    assert(rows(TxLog.read(spark, deep)) ==
      Set((1L, "p1", 10.0), (3L, "p2", 30.0), (4L, "p2", 40.0)))
  }

  test("SQL: the plain upsert MERGE takes the USING DELETION VECTORS suffix") {
    val path = freshPath("sqldv")
    TxLog.create(fixture, path, Some("part"))
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    Seq((2L, "p1", 99.0)).toDF("k", "part", "v")
      .createOrReplaceTempView("dv_upd")
    graft.tools.Sql.exec(spark,
      s"TXLOG MERGE INTO '$path' ON k USING SELECT * FROM dv_upd " +
        "USING DELETION VECTORS")
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(filesBefore.subsetOf(m.files.toSet) && m.dv.nonEmpty,
      "the suffix must route to the merge-on-read engine")
    assert(TxLog.read(spark, path).filter(col("k") === 2L)
      .select("v").as[Double].head() == 99.0)
  }

  test("readWithPosition: (file, pos) identity, stable under DV deletes") {
    val path = freshPath("pos")
    TxLog.create(fixture, path, Some("part"))
    val before = TxLog.readWithPosition(spark, path)
    assert(before.columns.toSet ==
      Set("k", "part", "v", "_file", "_pos"))
    assert(before.count() == 4)
    // positions are unique within a file and every entry is a
    // manifest suffix
    assert(before.select("_file", "_pos").distinct().count() == 4)
    val m = TxLog.manifest(spark, path, 1L)
    val suffixes = before.select("_file").distinct()
      .collect().map(_.getString(0)).toSet
    assert(suffixes.subsetOf(m.files.toSet), suffixes.toString)
    val posOfK2 = before.filter(col("k") === 2L)
      .select("_file", "_pos").head()
    // DV delete filters the row WITHOUT renumbering the survivors:
    // every surviving (file, pos) pair is unchanged
    val keep = before.filter(col("k") =!= 2L)
      .select("k", "_file", "_pos").collect().toSet
    TxLog.deleteWhere(spark, path, col("k") === 2L, deletionVectors = true)
    val after = TxLog.readWithPosition(spark, path)
    assert(after.count() == 3)
    assert(after.select("k", "_file", "_pos").collect().toSet == keep,
      "surviving positions must not renumber under a DV delete")
    assert(after.filter(col("_file") === posOfK2.getString(0) &&
      col("_pos") === posOfK2.getLong(1)).count() == 0,
      "the deleted row's position is gone")
  }
}
