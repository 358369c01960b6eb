package graft

import org.apache.spark.sql.functions._

import graft.storage.TxLog

class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txlog_$tag").toString + "/tbl"

  private def fixture = Seq(
    (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0),
    (4L, "p2", 40.0), (5L, "p3", 50.0), (6L, "p3", 60.0)
  ).toDF("k", "part", "v")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select("k", "part", "v").as[(Long, String, Double)].collect().toSet

  test("create/read round-trip; version-pinned read reproduces the pre-merge table") {
    val path = freshPath("pin")
    assert(TxLog.create(fixture, path, Some("part")) == 1L)
    assert(rows(TxLog.read(spark, path)) == rows(fixture))
    val updates = Seq((2L, "p1", 99.0), (7L, "p1", 70.0)).toDF("k", "part", "v")
    assert(TxLog.mergeInto(path, updates, Seq("k")) == 2L)
    // latest: updates win, new key present, other partitions untouched
    val want2 = rows(fixture).filterNot(_._1 == 2L) ++
      Set((2L, "p1", 99.0), (7L, "p1", 70.0))
    assert(rows(TxLog.read(spark, path)) == want2)
    // time travel: the pinned read is the pre-merge table, bit for bit
    assert(rows(TxLog.read(spark, path, Some(1L))) == rows(fixture))
    assert(TxLog.currentVersion(spark, path).contains(2L))
  }

  test("snapshot isolation: a reader resolved BEFORE the commit keeps its snapshot") {
    val path = freshPath("iso")
    TxLog.create(fixture, path, Some("part"))
    // resolve the reader first — it pins v1's file list
    val reader = TxLog.read(spark, path)
    val updates = Seq((1L, "p1", -1.0), (3L, "p2", -3.0)).toDF("k", "part", "v")
    TxLog.mergeInto(path, updates, Seq("k"))
    // the pre-commit reader sees EXACTLY v1 — never a mix of versions
    assert(rows(reader) == rows(fixture),
      "pre-commit reader observed the merge")
    // and a fresh reader sees exactly v2
    val want2 = rows(fixture).filterNot(r => r._1 == 1L || r._1 == 3L) ++
      Set((1L, "p1", -1.0), (3L, "p2", -3.0))
    assert(rows(TxLog.read(spark, path)) == want2)
  }

  test("mergeInto carries untouched partitions by reference: files byte-identical") {
    val path = freshPath("ref")
    TxLog.create(fixture, path, Some("part"))
    val m1 = TxLog.manifest(spark, path, 1L)
    def fileState(rel: String): (Long, Long) = {
      val f = new java.io.File(s"$path/data/$rel")
      (f.length, f.lastModified)
    }
    val untouched1 = m1.files.filterNot(_.startsWith("part=p1/"))
    val before = untouched1.map(f => f -> fileState(f)).toMap
    val updates = Seq((2L, "p1", 99.0)).toDF("k", "part", "v")
    TxLog.mergeInto(path, updates, Seq("k"))
    val m2 = TxLog.manifest(spark, path, 2L)
    // p2/p3 file ENTRIES are identical across manifests (by reference)...
    assert(m2.files.filterNot(_.startsWith("part=p1/")).toSet == untouched1.toSet,
      "untouched partition files were rewritten")
    // ...and the bytes on disk never moved
    untouched1.foreach(f => assert(fileState(f) == before(f), s"$f changed on disk"))
    // touched partition got NEW files; v1's p1 files still exist for time travel
    assert(m2.files.filter(_.startsWith("part=p1/")).toSet
      .intersect(m1.files.filter(_.startsWith("part=p1/")).toSet).isEmpty)
    m1.files.foreach(f => assert(new java.io.File(s"$path/data/$f").exists, s"$f deleted"))
  }

  test("a key MOVING partitions leaves no stale row; an emptied partition drops out") {
    val path = freshPath("move")
    val d = Seq((1L, "p1", 1.0), (2L, "p2", 2.0)).toDF("k", "part", "v")
    TxLog.create(d, path, Some("part"))
    // key 2 moves p2 -> p1, leaving p2 empty
    val updates = Seq((2L, "p1", 22.0)).toDF("k", "part", "v")
    TxLog.mergeInto(path, updates, Seq("k"))
    assert(rows(TxLog.read(spark, path)) == Set((1L, "p1", 1.0), (2L, "p1", 22.0)))
    assert(TxLog.manifest(spark, path, 2L).files.forall(!_.startsWith("part=p2/")),
      "emptied partition still referenced")
    // v1 still reproduces the pre-move layout
    assert(rows(TxLog.read(spark, path, Some(1L))) == rows(d))
  }

  test("append adds files without touching old ones") {
    val path = freshPath("app")
    TxLog.create(fixture, path, Some("part"))
    val m1 = TxLog.manifest(spark, path, 1L)
    TxLog.append(Seq((8L, "p1", 80.0)).toDF("k", "part", "v"), path)
    val m2 = TxLog.manifest(spark, path, 2L)
    assert(m1.files.toSet.subsetOf(m2.files.toSet), "append dropped old files")
    assert(rows(TxLog.read(spark, path)) == rows(fixture) + ((8L, "p1", 80.0)))
  }

  test("vacuum drops only unreferenced files; old versions become unreadable, latest intact") {
    val path = freshPath("vac")
    TxLog.create(fixture, path, Some("part"))
    val updates = Seq((2L, "p1", 99.0)).toDF("k", "part", "v")
    TxLog.mergeInto(path, updates, Seq("k"))
    val want = rows(TxLog.read(spark, path))
    val m1p1 = TxLog.manifest(spark, path, 1L).files.filter(_.startsWith("part=p1/"))
    val deleted = TxLog.vacuum(spark, path, keepVersions = 1)
    // exactly v1's superseded p1 files die — nothing the live manifest holds
    assert(deleted.toSet == m1p1.toSet, s"vacuum deleted $deleted, expected $m1p1")
    assert(rows(TxLog.read(spark, path)) == want, "latest version damaged by vacuum")
    intercept[IllegalArgumentException] { TxLog.read(spark, path, Some(1L)).collect() }
  }

  test("compact (OPTIMIZE): fewer files, identical rows, old version keeps the small files") {
    val path = freshPath("opt")
    TxLog.create(fixture, path, Some("part"))
    // four tiny appends fragment the partitions
    (0 until 4).foreach { i =>
      TxLog.append(Seq((100L + i, "p1", i.toDouble)).toDF("k", "part", "v"), path)
    }
    val vPre = TxLog.currentVersion(spark, path).get
    val preFiles = TxLog.manifest(spark, path, vPre).files
    val preP1 = preFiles.count(_.startsWith("part=p1/"))
    assert(preP1 >= 5, s"fixture not fragmented: $preP1 files in p1")
    val want = rows(TxLog.read(spark, path))
    val vPost = TxLog.compact(spark, path, targetBytesPerFile = 1L << 30)
    assert(vPost == vPre + 1)
    val postFiles = TxLog.manifest(spark, path, vPost).files
    assert(postFiles.count(_.startsWith("part=p1/")) == 1,
      s"p1 not compacted: ${postFiles.filter(_.startsWith("part=p1/"))}")
    assert(rows(TxLog.read(spark, path)) == want, "compaction changed content")
    // the fragmented layout is still readable at the old version
    assert(rows(TxLog.read(spark, path, Some(vPre))) == want)
    assert(preFiles.forall(f => new java.io.File(s"$path/data/$f").exists),
      "compact deleted files a retained manifest references")
    // a second compact is a no-op (everything already single-file)
    assert(TxLog.compact(spark, path) == vPost)
  }

  test("streaming ingest: micro-batches commit as versions; batch replay cannot double-append") {
    val path = freshPath("stream")
    val docs = Seq((1L, "p1", 1.0), (2L, "p2", 2.0), (3L, "p1", 3.0),
      (4L, "p2", 4.0), (5L, "p3", 5.0), (6L, "p3", 6.0))
      .toDF("k", "part", "v")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_txlog_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    TxLog.create(docs.limit(0), path, Some("part"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = TxLog.streamAppend(stream, path)
    try q.processAllAvailable() finally q.stop()
    assert(rows(TxLog.read(spark, path)) == rows(docs),
      "streamed table diverges from the source")
    val v = TxLog.currentVersion(spark, path).get
    assert(v >= 3, s"expected one version per micro-batch, got $v") // create + >=2 batches
    // crash replay: re-delivering the last batch is a NO-OP
    val lastBatch = TxLog.manifest(spark, path, v).sourceBatchId.get
    val vAfterReplay = TxLog.appendBatch(docs.limit(2), path, lastBatch)
    assert(vAfterReplay == v, "replayed batch double-appended")
    assert(rows(TxLog.read(spark, path)) == rows(docs))
  }

  test("read returns the DECLARED schema: column order and long partition type survive the round trip") {
    val path = freshPath("schema")
    // LONG partition column: naive parquet partition inference would
    // read the directory names back as INT, and partition columns
    // would migrate to the END of the schema
    val d = Seq((1L, 10.0, 7L), (2L, 20.0, 8L)).toDF("k", "v", "bucket")
    TxLog.create(d, path, Some("bucket"))
    val back = TxLog.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      d.schema.map(f => (f.name, f.dataType)),
      s"schema drifted: ${back.schema.toDDL} vs ${d.schema.toDDL}")
    assert(back.as[(Long, Double, Long)].collect().toSet == Set((1L, 10.0, 7L), (2L, 20.0, 8L)))
  }

  test("type-ambiguous and escaped partition VALUES survive: '01' stays '01', spaces merge cleanly") {
    val path = freshPath("vals")
    // "01" would partition-infer as INT 1; "a b" escapes to a%20b on disk
    val d = Seq((1L, "01", 1.0), (2L, "a b", 2.0), (3L, "01", 3.0))
      .toDF("k", "part", "v")
    TxLog.create(d, path, Some("part"))
    assert(rows(TxLog.read(spark, path)) == rows(d),
      "partition values corrupted by the read round trip")
    // merging into the escaped partition must drop its OLD files (the
    // touched-dir arithmetic has to match Spark's path escaping)
    TxLog.mergeInto(path, Seq((2L, "a b", 22.0)).toDF("k", "part", "v"), Seq("k"))
    assert(rows(TxLog.read(spark, path)) ==
      Set((1L, "01", 1.0), (2L, "a b", 22.0), (3L, "01", 3.0)))
    val m2 = TxLog.manifest(spark, path, 2L)
    val m1 = TxLog.manifest(spark, path, 1L)
    assert(m2.files.toSet.intersect(
      m1.files.filter(_.startsWith("part=a%20b/")).toSet).isEmpty,
      "escaped partition's old files survived the merge (stale rows)")
  }

  test("mergeInto fails loudly on null partition values instead of corrupting the rewrite set") {
    val path = freshPath("nullpart")
    TxLog.create(fixture, path, Some("part"))
    val nullUpd = Seq((1L, null.asInstanceOf[String], 9.0)).toDF("k", "part", "v")
    intercept[IllegalArgumentException] {
      TxLog.mergeInto(path, nullUpd, Seq("k"))
    }
  }

  test("batch replay detection survives interleaved maintenance commits (watermark carry)") {
    val path = freshPath("wm")
    TxLog.create(fixture, path, Some("part"))
    val b7 = Seq((10L, "p1", 10.0)).toDF("k", "part", "v")
    TxLog.appendBatch(b7, path, batchId = 7L)
    val want = rows(TxLog.read(spark, path))
    // maintenance commits between the batch and its crash-replay: the
    // watermark must carry forward through both
    (0 until 3).foreach { i =>
      TxLog.append(Seq((20L + i, "p1", i.toDouble)).toDF("k", "part", "v"), path)
    }
    TxLog.compact(spark, path, targetBytesPerFile = 1L << 30)
    val v = TxLog.currentVersion(spark, path).get
    val wantAfter = rows(TxLog.read(spark, path))
    assert(TxLog.appendBatch(b7, path, batchId = 7L) == v,
      "replayed batch slipped past an interleaved maintenance commit")
    assert(rows(TxLog.read(spark, path)) == wantAfter)
    val _ = want
  }

  test("a second commit of the same version fails loudly (optimistic concurrency)") {
    val path = freshPath("occ")
    TxLog.create(fixture, path, Some("part"))
    intercept[IllegalArgumentException] {
      TxLog.create(fixture, path, Some("part"))
    }
  }
}
