package graft.storage

import graft.SparkSpec

/** Optimistic concurrency over the TxLog commit log: writers that lose
  * the version-rename race REBASE when the interleaved commit did not
  * touch their read set (appends vs appends, compaction vs ingest into
  * other partitions) and throw [[TxLog.CommitConflictException]] when
  * it did (merges/deletes, whose key-location discovery reads the whole
  * snapshot). Interleavings are staged deterministically through the
  * package-private stageIn/commitRebase seam, plus one true-thread
  * contention test over the public API.
  */
class TxLogOccSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_occ_$tag"
    val f = new java.io.File(d)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)
    d
  }

  test("append that loses the version race rebases: both writers' rows land") {
    import spark.implicits._
    val path = freshDir("append_rebase")
    TxLog.create(Seq((1L, "a")).toDF("id", "v"), path)
    val base = TxLog.manifest(spark, path, 1L)
    // writer A stages its files against v1 but has not committed yet
    val aFiles = TxLog.stageIn(Seq((2L, "b")).toDF("id", "v"), path, Nil)
    // writer B commits first and takes v2
    TxLog.append(Seq((3L, "c")).toDF("id", "v"), path)
    // A's commit targets v2, loses, rebases onto the new head, lands v3
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = aFiles, schemaDdl = base.schemaDdl, batchId = None,
      readSet = Some(Set.empty), operation = "TEST")
    assert(v == 3L)
    val ids = TxLog.read(spark, path).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), ids.toString)
  }

  test("concurrent appends through the public API all land exactly once") {
    import spark.implicits._
    val path = freshDir("append_threads")
    TxLog.create(Seq((0L, "seed")).toDF("id", "v"), path)
    val frames = (1 to 8).map(i => Seq((i.toLong, s"w$i")).toDF("id", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = frames.map(df => pool.submit(
        new java.util.concurrent.Callable[Long] {
          def call(): Long = TxLog.append(df, path)
        }))
      val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // every append took a DISTINCT version — no lost update
      assert(versions.toSet.size == 8, versions.toString)
    } finally pool.shutdown()
    assert(TxLog.currentVersion(spark, path).contains(9L))
    val ids = TxLog.read(spark, path).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L to 8L).toSet, ids.toString)
  }

  test("merge-shaped commit (whole-table read set) conflicts loudly on any interleaved change") {
    import spark.implicits._
    val path = freshDir("merge_conflict")
    TxLog.create(Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "p", "v"), path,
      partitionCol = Some("p"))
    val base = TxLog.manifest(spark, path, 1L)
    val staged = TxLog.stageIn(Seq((1L, 1, "a2")).toDF("id", "p", "v"),
      path, Seq("p"))
    TxLog.append(Seq((9L, 3, "z")).toDF("id", "p", "v"), path) // interleaves as v2
    val e = intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base, rewriteDirs = Set("p=1"),
        newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
        readSet = None, operation = "TEST")
    }
    assert(e.getMessage.contains("recompute"), e.getMessage)
    // the loser left no manifest: head is still the winner's commit
    assert(TxLog.currentVersion(spark, path).contains(2L))
  }

  test("partition-scoped rewrite rebases over appends elsewhere, conflicts on its own partition") {
    import spark.implicits._
    val path = freshDir("compact_rebase")
    TxLog.create(Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "p", "v"), path,
      partitionCol = Some("p"))
    val base = TxLog.manifest(spark, path, 1L)
    // a compaction-shaped rewrite of p=1, computed against v1
    val staged = TxLog.stageIn(Seq((1L, 1, "a")).toDF("id", "p", "v"),
      path, Seq("p"))
    // ingest lands rows in p=3 first (v2)
    TxLog.append(Seq((9L, 3, "z")).toDF("id", "p", "v"), path)
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set("p=1"),
      newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
      readSet = Some(Set("p=1")), operation = "TEST")
    assert(v == 3L)
    val rows = TxLog.read(spark, path).select("id", "p").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((1L, 1), (2L, 2), (9L, 3)), rows.toString)

    // second round: an append INTO the partition being rewritten is a
    // real conflict — rebasing would silently drop the appended file
    val base2 = TxLog.manifest(spark, path, 3L)
    val staged2 = TxLog.stageIn(Seq((2L, 2, "b")).toDF("id", "p", "v"),
      path, Seq("p"))
    TxLog.append(Seq((21L, 2, "x")).toDF("id", "p", "v"), path) // lands in p=2
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base2, rewriteDirs = Set("p=2"),
        newFiles = staged2, schemaDdl = base2.schemaDdl, batchId = None,
        readSet = Some(Set("p=2")), operation = "TEST")
    }
  }

  // retry-on-conflict is the documented caller contract for merge-shaped
  // commits: mergeInto re-reads the snapshot on every attempt, so the
  // loop IS the recompute. Bounded so a livelock fails the test loudly.
  private def mergeRetry(path: String,
                         updates: org.apache.spark.sql.DataFrame,
                         keys: Seq[String]): Long = {
    var attempts = 0
    var v = -1L
    while (v < 0) {
      try v = TxLog.mergeInto(path, updates, keys)
      catch {
        case _: TxLog.CommitConflictException =>
          attempts += 1
          assert(attempts < 64, "merge retry livelock")
      }
    }
    v
  }

  test("concurrent mergeInto writers on OVERLAPPING partitions: no lost update, serializable outcome") {
    import spark.implicits._
    val path = freshDir("merge_threads_overlap")
    // ids 1..8 over partitions p = id % 4; every writer touches the
    // contested key id=1 AND its own keys AND inserts a fresh key —
    // updates, collisions, and inserts all race at once
    val base = (1 to 8).map(i => (i.toLong, (i % 4), s"base$i"))
    TxLog.create(base.toDF("id", "p", "v"), path, partitionCol = Some("p"))
    val writers = 1 to 4
    val frames = writers.map { w =>
      w -> Seq(
        (1L, 1, s"contested_w$w"),              // same key, same partition, all writers
        (w.toLong + 4L, (w + 4) % 4, s"own_w$w"), // writer-owned update
        (100L + w, w % 4, s"ins_w$w")           // fresh insert
      ).toDF("id", "p", "v")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val versions: Map[Int, Long] =
      try {
        val futures = frames.map { case (w, df) =>
          w -> pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = mergeRetry(path, df, Seq("id"))
          })
        }
        futures.map { case (w, f) =>
          w -> f.get(180, java.util.concurrent.TimeUnit.SECONDS)
        }.toMap
      } finally pool.shutdown()
    // every writer committed a DISTINCT version: four serial merges
    assert(versions.values.toSet.size == 4, versions.toString)
    val rows = TxLog.read(spark, path).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // no lost update: every writer's own update and insert survived
    writers.foreach { w =>
      assert(rows(w.toLong + 4L) == s"own_w$w", s"writer $w update lost")
      assert(rows(100L + w) == s"ins_w$w", s"writer $w insert lost")
    }
    // serializable: the contested key holds the LAST committer's value
    // (merges applied in version order, updates win on collision)
    val lastWriter = versions.maxBy(_._2)._1
    assert(rows(1L) == s"contested_w$lastWriter",
      s"contested key ${rows(1L)} vs last committer w$lastWriter ($versions)")
    // untouched base rows intact; cardinality = 8 base + 4 inserts
    assert(rows(2L) == "base2" && rows(3L) == "base3")
    assert(rows.size == 12, rows.toString)
  }

  test("concurrent mergeInto writers on DISJOINT partitions both land intact") {
    import spark.implicits._
    val path = freshDir("merge_threads_disjoint")
    TxLog.create(Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "p", "v"),
      path, partitionCol = Some("p"))
    // disjoint write sets — still merge-shaped (whole-snapshot read), so
    // the loser must conflict+retry rather than silently interleave
    val u1 = Seq((1L, 1, "a2"), (11L, 1, "n1")).toDF("id", "p", "v")
    val u2 = Seq((2L, 2, "b2"), (22L, 2, "n2")).toDF("id", "p", "v")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = mergeRetry(path, u1, Seq("id")) })
      val f2 = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = mergeRetry(path, u2, Seq("id")) })
      val (v1, v2) = (f1.get(180, java.util.concurrent.TimeUnit.SECONDS),
        f2.get(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(Set(v1, v2) == Set(2L, 3L), s"versions $v1/$v2")
    } finally pool.shutdown()
    val rows = TxLog.read(spark, path).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "a2", 2L -> "b2", 11L -> "n1", 22L -> "n2"),
      rows.toString)
  }

  test("mergeRebaseCheck: the file-granular read declaration, rule by rule") {
    import org.apache.spark.sql.types.StructType
    val declared = StructType.fromDDL("id BIGINT, v STRING")
    val statsOf = (f: String, lo: String, hi: String) =>
      f -> Map("id" -> (lo, hi))
    val base = TxLog.Manifest(1L, Nil, declared.toDDL,
      files = Seq("fA", "fB"), statsCols = Seq("id"),
      fileStats = Map(statsOf("fA", "1", "10"), statsOf("fB", "1000", "1010")))
    val bounds = Some(("id", "1", "10")) // the merge's source spans fA
    def chk(latest: TxLog.Manifest,
            keyBounds: Option[(String, String, String)] = bounds,
            sourceEmpty: Boolean = false,
            read: Set[String] = Set("fA"),
            touched: Set[String] = Set("fA")) =
      TxLog.mergeRebaseCheck(declared, keyBounds, sourceEmpty,
        read, touched, "UTC")(base, latest)
    // 1. a touched file removed at the head conflicts
    assert(chk(base.copy(version = 2L, files = Seq("fB"))).isDefined,
      "removed touched file must conflict")
    // 2. DV state change on a READ file conflicts; on an unread one, rebases
    val dvOnA = base.copy(version = 2L, dv = Seq("d1.dv" -> Map("fA" -> 1L)))
    assert(chk(dvOnA).isDefined, "DV on a read file must conflict")
    val dvOnB = base.copy(version = 2L, dv = Seq("d1.dv" -> Map("fB" -> 1L)))
    assert(chk(dvOnB).isEmpty, "DV on an unread file must rebase")
    // 3. added files vote against the source-key bounds
    val addedOut = base.copy(version = 2L, files = Seq("fA", "fB", "fC"),
      fileStats = base.fileStats + statsOf("fC", "500", "600"))
    assert(chk(addedOut).isEmpty,
      "added file outside the merged key range must rebase")
    val addedIn = base.copy(version = 2L, files = Seq("fA", "fB", "fC"),
      fileStats = base.fileStats + statsOf("fC", "5", "7"))
    assert(chk(addedIn).isDefined,
      "added file inside the merged key range must conflict")
    val addedNoStats = base.copy(version = 2L, files = Seq("fA", "fB", "fC"))
    assert(chk(addedNoStats).isDefined,
      "added file without stats must conservatively conflict")
    // no provable bounds (multi-key merge): any added file conflicts
    assert(chk(addedOut, keyBounds = None).isDefined,
      "unprovable key set must conflict on any added file")
    // empty source: nothing to collide — added files rebase
    assert(chk(addedIn, keyBounds = None, sourceEmpty = true).isEmpty,
      "empty source must admit any added file")
    // untouched-unread file removal rebases (it was exactly scanned and
    // held no matched key; its replacement is judged by rule 3)
    val swapped = base.copy(version = 2L, files = Seq("fA", "fC"),
      fileStats = Map(statsOf("fA", "1", "10"), statsOf("fC", "1000", "1010")),
      dv = Nil)
    assert(chk(swapped, read = Set("fA"), touched = Set("fA")).isEmpty,
      "compaction of an unread file outside the key range must rebase")
  }

  test("predicateRebaseCheck: blind appends rebase; non-blind adds conflict") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val path = freshDir("predicate_rebase")
    TxLog.create((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), path)
    val base = TxLog.manifest(spark, path, 1L)
    val schema = StructType.fromDDL(base.schemaDdl)
    val touched = base.files.toSet
    def chk(latestV: Long) = TxLog.predicateRebaseCheck(spark, path, schema,
      touched, "UTC")(base, TxLog.manifest(spark, path, latestV))
    // a BLIND append serializes after the predicate op: rebase
    TxLog.append(Seq((100L, "blind")).toDF("id", "v").coalesce(1), path)
    assert(chk(2L).isEmpty, "blind append must rebase: " + chk(2L))
    // an UPDATE's added files may hold REWRITTEN rows that now match
    // the predicate — Delta's WriteSerializable exempts blind appends
    // ONLY. The update rewrites the appended file, not a touched one,
    // so rules 1/2 stay silent and provenance alone must decide.
    TxLog.updateWhere(spark, path, Seq("v" -> "'rewritten'"),
      org.apache.spark.sql.functions.col("id") === 100L)
    val r = chk(3L)
    assert(r.exists(_.contains("non-blind")),
      s"non-blind interleaved adds must conflict: $r")
    // rule 1 still binds through the shared checker: losing a touched
    // file conflicts regardless of provenance
    val latest3 = TxLog.manifest(spark, path, 3L)
    assert(TxLog.predicateRebaseCheck(spark, path, schema,
      Set("data/not_there.parquet"), "UTC")(base, latest3).isDefined)
  }

  test("merge commit rebases over a disjoint-range append via its rebaseCheck") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val path = freshDir("merge_rebase_disjoint")
    TxLog.create((1L to 10L).map(i => (i, s"base$i")).toDF("id", "v")
      .coalesce(1), path, statsCols = Seq("id"))
    val base = TxLog.manifest(spark, path, 1L)
    val declared = StructType.fromDDL(base.schemaDdl)
    val hit = base.files.toSet // single file: the merge rewrites it
    val staged = TxLog.stageIn(
      (1L to 10L).map(i => (i, s"upd$i")).toDF("id", "v").coalesce(1),
      path, Nil)
    // interleaved append of a DISJOINT key range (stats [1000, 1010])
    TxLog.append((1000L to 1010L).map(i => (i, s"hi$i")).toDF("id", "v")
      .coalesce(1), path)
    // the merge's declaration: read+touch the base file, keys in [1, 10]
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
      readSet = None, operation = "MERGE", removeFiles = hit,
      rebaseCheck = Some(TxLog.mergeRebaseCheck(declared,
        Some(("id", "1", "10")), sourceEmpty = false, hit, hit, "UTC")))
    assert(v == 3L, s"disjoint-range merge must rebase, not conflict (v$v)")
    val rows = TxLog.read(spark, path).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "upd1" && rows(1000L) == "hi1000" && rows.size == 21,
      rows.toString)
    // and an OVERLAPPING interleave still conflicts through the checker
    val base2 = TxLog.manifest(spark, path, 3L)
    val hit2 = Set(base2.files.head)
    val staged2 = TxLog.stageIn(Seq((1L, "x")).toDF("id", "v"), path, Nil)
    TxLog.append(Seq((5L, "clash")).toDF("id", "v").coalesce(1), path)
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base2, rewriteDirs = Set.empty,
        newFiles = staged2, schemaDdl = base2.schemaDdl, batchId = None,
        readSet = None, operation = "MERGE", removeFiles = hit2,
        rebaseCheck = Some(TxLog.mergeRebaseCheck(declared,
          Some(("id", "1", "10")), sourceEmpty = false, hit2, hit2, "UTC")))
    }
  }

  test("concurrent mergeInto on disjoint STATS-TRACKED key ranges: no conflict surfaced") {
    import spark.implicits._
    val path = freshDir("merge_disjoint_keys")
    // two files with disjoint id ranges in the SAME partition, id
    // stats-tracked — the shape where the file-granular read set
    // admits concurrent lanes
    TxLog.create((1L to 10L).map(i => (i, 1, s"lo$i")).toDF("id", "p", "v")
      .coalesce(1), path, partitionCol = Some("p"), statsCols = Seq("id"))
    TxLog.append((1000L to 1010L).map(i => (i, 1, s"hi$i"))
      .toDF("id", "p", "v").coalesce(1), path)
    val uLo = Seq((1L, 1, "lo_upd"), (501L, 1, "lo_ins")).toDF("id", "p", "v")
    val uHi = Seq((1000L, 1, "hi_upd"), (700L, 1, "hi_ins")).toDF("id", "p", "v")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // NO retry wrapper: a CommitConflictException fails the future —
      // disjoint-range merges must commit via rebase alone
      val fLo = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = TxLog.mergeInto(path, uLo, Seq("id")) })
      val fHi = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = TxLog.mergeInto(path, uHi, Seq("id")) })
      val (v1, v2) = (fLo.get(180, java.util.concurrent.TimeUnit.SECONDS),
        fHi.get(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(Set(v1, v2) == Set(3L, 4L), s"versions $v1/$v2")
    } finally pool.shutdown()
    val rows = TxLog.read(spark, path).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "lo_upd" && rows(501L) == "lo_ins" &&
      rows(1000L) == "hi_upd" && rows(700L) == "hi_ins" &&
      rows.size == 23, rows.toString)
  }

  test("DELETE/UPDATE rebase over blind appends (serialize-first), conflict on touched files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val path = freshDir("del_vs_append")
    TxLog.create((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), path)
    // DELETE staged against v1, an append interleaves: the delete
    // must REBASE (its snapshot never contained the new rows — the
    // appended rows survive, the matched rows go)
    val base = TxLog.manifest(spark, path, 1L)
    val hit = base.files.toSet
    val staged = TxLog.stageIn(
      (1L to 10L).filter(_ % 2 == 1).map(i => (i, s"v$i")).toDF("id", "v")
        .coalesce(1), path, Nil)
    TxLog.append(Seq((100L, "late")).toDF("id", "v").coalesce(1), path) // v2
    val vDel = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
      readSet = None, operation = "DELETE", removeFiles = hit,
      rebaseCheck = Some(TxLog.mergeRebaseCheck(
        org.apache.spark.sql.types.StructType.fromDDL(base.schemaDdl),
        None, sourceEmpty = true, hit, hit, "UTC")))
    assert(vDel == 3L, s"delete must rebase over the append (v$vDel)")
    val ids = TxLog.read(spark, path).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 5L, 7L, 9L, 100L), ids.toString)
    // end-to-end through the public API: a threaded append + delete
    // pair both land without a conflict surfacing
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fDel = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = TxLog.deleteWhere(spark, path, expr("id = 9")) })
      val fApp = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long =
          TxLog.append(Seq((200L, "x")).toDF("id", "v").coalesce(1), path) })
      fDel.get(180, java.util.concurrent.TimeUnit.SECONDS)
      fApp.get(180, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    val after = TxLog.read(spark, path).select("id").as[Long].collect().toSet
    assert(after == Set(1L, 3L, 5L, 7L, 100L, 200L), after.toString)
    // but a concurrent rewrite of a file the delete TOUCHES conflicts
    val base2 = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get)
    val touched = Set(base2.files.head)
    val staged2 = TxLog.stageIn(Seq((1L, "keep")).toDF("id", "v"), path, Nil)
    TxLog.compact(spark, path, minFilesToCompact = 1) // rewrites everything
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base2, rewriteDirs = Set.empty,
        newFiles = staged2, schemaDdl = base2.schemaDdl, batchId = None,
        readSet = None, operation = "DELETE", removeFiles = touched,
        rebaseCheck = Some(TxLog.mergeRebaseCheck(
          org.apache.spark.sql.types.StructType.fromDDL(base2.schemaDdl),
          None, sourceEmpty = true, touched, touched, "UTC")))
    }
  }

  test("replayed micro-batch that loses its race is still committed exactly once") {
    import spark.implicits._
    val path = freshDir("batch_replay")
    TxLog.create(Seq((0L, "seed")).toDF("id", "v"), path)
    TxLog.appendBatch(Seq((1L, "b1")).toDF("id", "v"), path, batchId = 1L) // v2
    // a crash-replay of batch 1, staged against the STALE v1 manifest
    val base = TxLog.manifest(spark, path, 1L)
    val staged = TxLog.stageIn(Seq((1L, "b1")).toDF("id", "v"), path, Nil)
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = staged, schemaDdl = base.schemaDdl, batchId = Some(1L),
      readSet = Some(Set.empty), operation = "TEST")
    assert(v == 2L) // detected at rebase time: no third version
    assert(TxLog.currentVersion(spark, path).contains(2L))
    assert(TxLog.read(spark, path).count() == 2L)
  }
}
