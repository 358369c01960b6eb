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
    val aFiles = TxLog.stageIn(Seq((2L, "b")).toDF("id", "v"), path, None)
    // writer B commits first and takes v2
    TxLog.append(Seq((3L, "c")).toDF("id", "v"), path)
    // A's commit targets v2, loses, rebases onto the new head, lands v3
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = aFiles, schemaDdl = base.schemaDdl, batchId = None,
      readSet = Some(Set.empty))
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
      path, Some("p"))
    TxLog.append(Seq((9L, 3, "z")).toDF("id", "p", "v"), path) // interleaves as v2
    val e = intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base, rewriteDirs = Set("p=1"),
        newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
        readSet = None)
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
      path, Some("p"))
    // ingest lands rows in p=3 first (v2)
    TxLog.append(Seq((9L, 3, "z")).toDF("id", "p", "v"), path)
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set("p=1"),
      newFiles = staged, schemaDdl = base.schemaDdl, batchId = None,
      readSet = Some(Set("p=1")))
    assert(v == 3L)
    val rows = TxLog.read(spark, path).select("id", "p").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((1L, 1), (2L, 2), (9L, 3)), rows.toString)

    // second round: an append INTO the partition being rewritten is a
    // real conflict — rebasing would silently drop the appended file
    val base2 = TxLog.manifest(spark, path, 3L)
    val staged2 = TxLog.stageIn(Seq((2L, 2, "b")).toDF("id", "p", "v"),
      path, Some("p"))
    TxLog.append(Seq((21L, 2, "x")).toDF("id", "p", "v"), path) // lands in p=2
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base2, rewriteDirs = Set("p=2"),
        newFiles = staged2, schemaDdl = base2.schemaDdl, batchId = None,
        readSet = Some(Set("p=2")))
    }
  }

  test("replayed micro-batch that loses its race is still committed exactly once") {
    import spark.implicits._
    val path = freshDir("batch_replay")
    TxLog.create(Seq((0L, "seed")).toDF("id", "v"), path)
    TxLog.appendBatch(Seq((1L, "b1")).toDF("id", "v"), path, batchId = 1L) // v2
    // a crash-replay of batch 1, staged against the STALE v1 manifest
    val base = TxLog.manifest(spark, path, 1L)
    val staged = TxLog.stageIn(Seq((1L, "b1")).toDF("id", "v"), path, None)
    val v = TxLog.commitRebase(spark, path, base, rewriteDirs = Set.empty,
      newFiles = staged, schemaDdl = base.schemaDdl, batchId = Some(1L),
      readSet = Some(Set.empty))
    assert(v == 2L) // detected at rebase time: no third version
    assert(TxLog.currentVersion(spark, path).contains(2L))
    assert(TxLog.read(spark, path).count() == 2L)
  }
}
