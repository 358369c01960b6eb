package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-time CDC capture (`graft.changeDataFeed`) — the r16 keyless
  * change feed: row-changing verbs stage their change record at
  * commit time, [[TxLog.changeFeed]] serves it (a) on tables with NO
  * unique row identity and (b) reading O(changed rows) per version,
  * with EXACT update pre/postimages (no key join). */
class TxLogCdfCaptureSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cdc_$tag").toString + "/t"

  private def events(df: org.apache.spark.sql.DataFrame): Set[(String, Long, String, Double)] =
    df.select(col("_change_type"), col("_commit_version"), col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet

  test("keyless feed on a table with DUPLICATE rows: inserts, deletes, exact preimages") {
    val path = fresh("dup")
    // a keyless audit shape: k is NOT unique — the snapshot-diff door
    // cannot serve this table at all
    TxLog.create(Seq(("a", 1.0), ("a", 1.0), ("b", 2.0))
      .toDF("k", "v"), path)                                      // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                    // v2
    TxLog.append(Seq(("c", 3.0), ("a", 1.0)).toDF("k", "v"), path) // v3
    TxLog.deleteWhere(spark, path, col("k") === "a")              // v4 (3 rows)
    TxLog.updateWhere(spark, path, Seq("v" -> "v * 10"),
      col("k") === "b")                                           // v5
    val feed = TxLog.changeFeed(spark, path, 0L, 5L)
    assert(feed.columns.toSeq ==
      Seq("k", "v", "_change_type", "_commit_version", "_commit_timestamp"),
      feed.columns.mkString(", "))
    val got = events(feed)
    val expected = Set(
      ("insert", 1L, "a", 1.0), ("insert", 1L, "b", 2.0),
      ("insert", 3L, "c", 3.0), ("insert", 3L, "a", 1.0),
      ("delete", 4L, "a", 1.0), ("delete", 4L, "a", 1.0),
      ("delete", 4L, "a", 1.0),
      ("update_preimage", 5L, "b", 2.0),
      ("update_postimage", 5L, "b", 20.0))
    // Set collapses the duplicate rows — compare with multiplicity
    val gotM = feed.groupBy("_change_type", "_commit_version", "k", "v")
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3)) -> r.getLong(4)).toMap
    assert(gotM(("insert", 1L, "a", 1.0)) == 2L,
      "duplicate created rows must BOTH appear as inserts")
    assert(gotM(("delete", 4L, "a", 1.0)) == 3L,
      s"all three duplicate 'a' rows must appear as deletes: $gotM")
    assert(got == expected, got.toString)
    assert(gotM(("update_preimage", 5L, "b", 2.0)) == 1L &&
      gotM(("update_postimage", 5L, "b", 20.0)) == 1L,
      "updates carry exact pre/postimages without any key join")
    // a caught-up window is empty, never an exception
    assert(TxLog.changeFeed(spark, path, 5L, 5L).count() == 0L)
  }

  test("event-feed ≡ snapshot-diff on single-version windows across every captured verb") {
    val path = fresh("parity")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "part", "v"), path, Some("part"), statsCols = Seq("k"))
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))
    def parity(commit: => Long): Unit = {
      val v = commit
      val viaFeed = TxLog.changeFeed(spark, path, v - 1, v)
        .drop("_commit_version", "_commit_timestamp")
      val viaDiff = TxLog.changes(spark, path, v - 1, v, Seq("k"),
        withPreimages = true)
      assert(viaFeed.columns.sorted.toSeq == viaDiff.columns.sorted.toSeq,
        s"v$v schema: ${viaFeed.columns.mkString(",")} vs ${viaDiff.columns.mkString(",")}")
      val cols = viaDiff.columns.toSeq
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      assert(rows(viaFeed) == rows(viaDiff),
        s"v$v: feed ${rows(viaFeed)} vs diff ${rows(viaDiff)}")
    }
    parity(TxLog.mergeInto(path,
      Seq((2L, "p1", 20.0), (4L, "p2", 4.0)).toDF("k", "part", "v"),
      Seq("k")))
    parity(TxLog.deleteWhere(spark, path, col("k") === 1L))
    parity(TxLog.updateWhere(spark, path, Seq("v" -> "v + 0.5"),
      col("k") === 3L))
    parity(TxLog.replaceWhere(
      Seq((7L, "p2", 7.0)).toDF("k", "part", "v"), path,
      col("part") === "p2"))
    parity(TxLog.mergeWhen(path, Seq((7L, "p2", 70.0), (8L, "p1", 8.0))
      .toDF("k", "part", "v"), Seq("k"),
      matched = Seq(TxLog.MergeClause(None, "update",
        Seq("v" -> "src.v"))),
      notMatched = Seq(TxLog.MergeClause(None, "insert"))))
    parity(TxLog.applyChanges(path,
      Seq((8L, "p1", 80.0, "update"), (9L, "p1", 9.0, "insert"),
        (2L, "p1", 0.0, "delete"))
        .toDF("k", "part", "v", "_change_type"), Seq("k")))
    parity(TxLog.replacePartitions(
      Seq((10L, "p1", 10.0)).toDF("k", "part", "v"), path, Seq("p1")))
    parity(TxLog.createOrReplace(
      Seq((11L, "p1", 11.0)).toDF("k", "part", "v"), path,
      keepPolicies = true))
  }

  test("keyed changes() fast path ≡ snapshot diff: twin tables, one declared, one not") {
    // the SAME history lands on a CDF-declared table (single-commit
    // windows diff the record — O(changed rows)) and an undeclared
    // twin (two-snapshot diff); the outputs must match byte-for-byte,
    // including the cases that distinguish the algorithms: a NO-OP
    // update (merge re-presenting identical values — both must drop
    // it), a replaceWhere delete+reinsert of the SAME key with new
    // values (net update), and a key-moving update (delete+insert).
    val decl = fresh("twin_d")
    val twin = fresh("twin_u")
    def build(path: String, declare: Boolean): Unit = {
      TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
        .toDF("k", "part", "v"), path, Some("part"))
      if (declare) TxLog.setProperties(spark, path,
        Map(TxLog.ChangeDataFeedProp -> "true"))
      else TxLog.setProperties(spark, path, Map("tier" -> "twin"))
      // merge: k=2 NO-OP (identical values), k=4 insert, k=3 update
      TxLog.mergeInto(path, Seq((2L, "p1", 2.0), (3L, "p2", 30.0),
        (4L, "p2", 4.0)).toDF("k", "part", "v"), Seq("k"))
      // replaceWhere p2: k=3 reinserted with a NEW value (net update),
      // k=4 reinserted IDENTICAL (net nothing), k=5 fresh (net insert)
      TxLog.replaceWhere(Seq((3L, "p2", 300.0), (4L, "p2", 4.0),
        (5L, "p2", 5.0)).toDF("k", "part", "v"), path,
        col("part") === "p2")
      // key-moving update: k=1 -> k=100 (diff on k: delete + insert)
      TxLog.updateWhere(spark, path, Seq("k" -> "100"), col("k") === 1L)
    }
    build(decl, declare = true)
    build(twin, declare = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    (2L to 4L).foreach { v =>
      Seq(false, true).foreach { pre =>
        val fast = TxLog.changes(spark, decl, v, v + 1, Seq("k"),
          withPreimages = pre)
        val slow = TxLog.changes(spark, twin, v, v + 1, Seq("k"),
          withPreimages = pre)
        assert(rows(fast) == rows(slow),
          s"v$v->v${v + 1} (preimages=$pre): fast ${rows(fast)} " +
            s"vs snapshot ${rows(slow)}")
      }
    }
    // the no-op merge window nets exactly {insert 4, update 3}
    val net = TxLog.changes(spark, decl, 2L, 3L, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    assert(net == Set((4L, "insert"), (3L, "update")),
      s"no-op update must drop: $net")
  }

  test("OPTIMIZE is skipped; uncaptured row changes refuse; RESTORE synthesizes") {
    val path = fresh("gaps")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path)   // v1
    TxLog.deleteWhere(spark, path, col("k") === 1L)                // v2: uncaptured
    val e = intercept[UnsupportedOperationException] {
      TxLog.changeFeed(spark, path, 1L, 2L).collect()
    }
    assert(e.getMessage.contains("changeDataFeed"), e.getMessage)
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                     // v3
    TxLog.append(Seq((3L, 3.0)).toDF("k", "v"), path)              // v4
    TxLog.append(Seq((4L, 4.0)).toDF("k", "v"), path)              // v5
    TxLog.compact(spark, path)                                     // v6: OPTIMIZE
    val got = events(TxLog.changeFeed(spark, path, 2L, 6L)
      .withColumn("k", col("k").cast("string")))
    assert(got == Set(("insert", 4L, "3", 3.0), ("insert", 5L, "4", 4.0)),
      s"OPTIMIZE must contribute no events: $got")
    // RESTORE synthesizes its record from the manifest diff (r16
    // verdict #1): rolling v6 back to v4 drops the v5 append — but v6
    // was an OPTIMIZE that rewrote [v4's rows ∪ v5's row] into one
    // file, so the file-granular diff emits the compacted file's three
    // live rows as deletes and v4's two files' rows as (re)inserts:
    // net k=4 gone, and a keyless add/subtract consumer lands exactly
    // on the v4 snapshot
    TxLog.restore(spark, path, 4L)                                 // v7
    val across = TxLog.changeFeed(spark, path, 6L, 7L)
      .withColumn("k", col("k").cast("string"))
    val gotR = events(across)
    assert(gotR == Set(
      ("delete", 7L, "2", 2.0), ("delete", 7L, "3", 3.0),
      ("delete", 7L, "4", 4.0),
      ("insert", 7L, "2", 2.0), ("insert", 7L, "3", 3.0)),
      s"restore file-diff events: $gotR")
    // windows that STOP before the restore serve exactly as before
    assert(TxLog.changeFeed(spark, path, 2L, 6L).count() == 2L)
    // and a window SPANNING the restore is the union of both sides
    assert(TxLog.changeFeed(spark, path, 2L, 7L).count() == 7L)
  }

  test("feed through a clean restore ≡ keyed snapshot diff (no rewrites between)") {
    val path = fresh("restore_eq")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path)   // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                     // v2
    TxLog.append(Seq((3L, 3.0), (4L, 4.0)).toDF("k", "v"), path)   // v3
    TxLog.restore(spark, path, 2L)                                 // v4
    // prev v3 = {createFile, appendFile}, target v2 = {createFile}:
    // the diff is exactly the appended file — pure deletes, no churn
    val feed = TxLog.changeFeed(spark, path, 3L, 4L)
      .select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(feed == Set(("delete", 3L, 3.0), ("delete", 4L, 4.0)), feed.toString)
    val keyed = TxLog.changes(spark, path, 3L, 4L, Seq("k"))
      .select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(feed == keyed, s"feed $feed vs keyed diff $keyed")
    // the feed keeps serving PAST the restore
    TxLog.append(Seq((5L, 5.0)).toDF("k", "v"), path)              // v5
    val spanning = TxLog.changeFeed(spark, path, 2L, 5L)
      .select("_change_type", "_commit_version", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(spanning == Set(
      ("insert", 3L, 3L), ("insert", 3L, 4L),
      ("delete", 4L, 3L), ("delete", 4L, 4L),
      ("insert", 5L, 5L)), spanning.toString)
  }

  test("restore across a DV delete flips exactly the covered rows, both directions") {
    val path = fresh("restore_dv")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("k", "v"), path)                                       // v1
    TxLog.setProperties(spark, path, Map(
      TxLog.ChangeDataFeedProp -> "true"))                         // v2
    TxLog.deleteWhere(spark, path, col("k") <= 2L,
      deletionVectors = true)                                      // v3 (DV)
    // file sets of v2 and v3 are IDENTICAL — only the DV state moved:
    // rolling back un-deletes k=1,2, which must surface as inserts
    TxLog.restore(spark, path, 2L)                                 // v4
    def ev(from: Long, to: Long) =
      TxLog.changeFeed(spark, path, from, to)
        .select("_change_type", "_commit_version", "k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(ev(3L, 4L) == Set(("insert", 4L, 1L), ("insert", 4L, 2L)),
      s"un-deleted rows must re-insert: ${ev(3L, 4L)}")
    assert(TxLog.read(spark, path).count() == 4L)
    // forward again: restore INTO the DV state re-deletes them
    TxLog.restore(spark, path, 3L)                                 // v5
    assert(ev(4L, 5L) == Set(("delete", 5L, 1L), ("delete", 5L, 2L)),
      s"re-covered rows must delete: ${ev(4L, 5L)}")
    // the whole window nets out to the v5 snapshot for an
    // add/subtract consumer: insert 4, delete 2, insert 2, delete 2
    assert(ev(0L, 5L).count(_._1 == "insert") == 6 &&
      ev(0L, 5L).count(_._1 == "delete") == 4, ev(0L, 5L).toString)
    // and parity with the keyed snapshot diff on the flip windows
    val keyed = TxLog.changes(spark, path, 4L, 5L, Seq("k"))
      .select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(keyed == Set(("delete", 1L), ("delete", 2L)), keyed.toString)
  }

  test("over-budget DV flips drop the broadcast hint: distributed fallback, row-exact") {
    // r17 verdict #1: the flip lane force-broadcast the DV position
    // sets with no size guard — the identical shape the batch mount
    // prices from the manifest's per-entry counts. Post-fix the hint
    // rides only under graft.txlog.dvBroadcastMaxRows; here the
    // budget is forced to 0 so the position semi-joins must plan
    // DISTRIBUTED (no static BroadcastExchange on the _dv_idx side —
    // autoBroadcastJoinThreshold is disabled so only a leftover hint
    // could produce one), with results identical to the hinted plan.
    val path = fresh("flip_budget")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("k", "v"), path)                                       // v1
    TxLog.setProperties(spark, path, Map(
      TxLog.ChangeDataFeedProp -> "true"))                         // v2
    TxLog.deleteWhere(spark, path, col("k") <= 2L,
      deletionVectors = true)                                      // v3 (DV)
    TxLog.restore(spark, path, 2L)                                 // v4
    TxLog.restore(spark, path, 3L)                                 // v5
    def ev(from: Long, to: Long) =
      TxLog.changeFeed(spark, path, from, to)
        .select("_change_type", "_commit_version", "k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val hintedBack = ev(3L, 4L)
    val hintedFwd = ev(4L, 5L)
    spark.conf.set("graft.txlog.dvBroadcastMaxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val feed = TxLog.changeFeed(spark, path, 3L, 4L)
      val plan = feed.queryExecution.sparkPlan.toString
      val broadcastPos = plan.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") && l.contains("_dv_idx")).toSeq
      assert(broadcastPos.isEmpty,
        s"position semi-join must not broadcast over budget:\n$broadcastPos")
      assert(plan.linesIterator.exists(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
          l.contains("_dv_idx")),
        s"expected a distributed position semi-join in:\n$plan")
      assert(ev(3L, 4L) == hintedBack,
        s"fallback parity (un-delete): ${ev(3L, 4L)} vs $hintedBack")
      assert(ev(4L, 5L) == hintedFwd,
        s"fallback parity (re-delete): ${ev(4L, 5L)} vs $hintedFwd")
    } finally {
      spark.conf.unset("graft.txlog.dvBroadcastMaxRows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("racing append vs INSERT OVERWRITE: the committed capture deletes the REAL replaced snapshot") {
    // r16 advice (medium): createOrReplace computed its CDC capture
    // once, against the head it entered with — an append interleaving
    // before the winning commit was physically erased by the replace
    // but absent from the record. The fix recomputes the capture
    // inside the retry loop whenever the head moved. Pinned here as a
    // fold-consistency property that holds under EVERY interleaving:
    // replaying the keyless feed from v0 must land exactly on the
    // final snapshot (under-reported deletes leave phantom rows).
    (1 to 4).foreach { i =>
      val path = fresh(s"replace_race_$i")
      TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path)  // v1
      TxLog.setProperties(spark, path,
        Map(TxLog.ChangeDataFeedProp -> "true"))                    // v2
      val appender = new Thread(() => {
        Thread.sleep(i * 150L) // sweep the interleave window
        try TxLog.append(Seq((10L + i, 10.0)).toDF("k", "v"), path)
        catch { case _: Throwable => () }
      })
      appender.start()
      try TxLog.createOrReplace(
        Seq((3L, 3.0), (4L, 4.0)).toDF("k", "v"), path,
        keepPolicies = true)
      catch { case _: TxLog.CommitConflictException => () } // loud is fine
      appender.join()
      val head = TxLog.currentVersion(spark, path).get
      val feed = TxLog.changeFeed(spark, path, 0L, head)
        .groupBy("k", "v").agg(
          sum(when(col("_change_type") === "insert", 1)
            .when(col("_change_type") === "delete", -1)
            .otherwise(0)).as("net"))
        .where(col("net") =!= 0)
        .select("k", "v", "net").collect()
        .map(r => ((r.getLong(0), r.getDouble(1)), r.getLong(2))).toMap
      val snap = TxLog.read(spark, path).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(feed == snap,
        s"iteration $i: folded feed $feed != snapshot $snap — the " +
          "replace's capture missed an interleaved commit's rows")
    }
  }

  test("keyless replication loop: changeFeed → applyChangeEvents, duplicate rows, across a restore") {
    val primary = fresh("loop_p")
    val replica = fresh("loop_r")
    // a table with NO key: duplicate rows are first-class
    TxLog.create(Seq(("a", 1.0), ("a", 1.0), ("b", 2.0))
      .toDF("k", "v"), primary)                                     // v1
    TxLog.setProperties(spark, primary,
      Map(TxLog.ChangeDataFeedProp -> "true"))                      // v2
    TxLog.append(Seq(("c", 3.0), ("a", 1.0)).toDF("k", "v"), primary) // v3
    TxLog.deleteWhere(spark, primary, col("k") === "a")             // v4
    TxLog.updateWhere(spark, primary, Seq("v" -> "v * 10"),
      col("k") === "b")                                             // v5
    TxLog.restore(spark, primary, 3L)                               // v6
    TxLog.append(Seq(("d", 4.0)).toDF("k", "v"), primary)           // v7
    // replica starts EMPTY and replays the whole history as events
    TxLog.create(Seq.empty[(String, Double)].toDF("k", "v"), replica)
    def multiset(path: String, ver: Option[Long] = None) =
      TxLog.read(spark, path, ver).groupBy("k", "v").count()
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
        .toMap
    // stepwise: after each window the replica IS that version
    (1L to 7L).foreach { v =>
      TxLog.applyChangeEvents(replica,
        TxLog.changeFeed(spark, primary, v - 1, v))
      assert(multiset(replica) == multiset(primary, Some(v)),
        s"replica drifted at v$v: ${multiset(replica)} vs " +
          s"${multiset(primary, Some(v))}")
    }
    // and ONE wide window onto a fresh empty replica lands on the head
    // (intra-window churn — insert→delete→re-insert via the restore —
    // nets out in the multiset algebra)
    val replica2 = fresh("loop_r2")
    TxLog.create(Seq.empty[(String, Double)].toDF("k", "v"), replica2)
    TxLog.applyChangeEvents(replica2,
      TxLog.changeFeed(spark, primary, 0L, 7L), txn = Some(("lane", 7L)))
    assert(multiset(replica2) == multiset(primary), multiset(replica2).toString)
    // the apply is O(changed rows): removals land as DELETION VECTORS
    // (no rewrite), adds as appended files
    val hist = TxLog.history(spark, replica).collect()
      .map(_.toString).mkString("\n")
    assert(hist.contains("APPLY CHANGES (KEYLESS)"), hist)
    // per-app idempotency lane: a replayed window is a no-op
    val after1 = TxLog.currentVersion(spark, replica2).get
    TxLog.applyChangeEvents(replica2,
      TxLog.changeFeed(spark, primary, 0L, 7L), txn = Some(("lane", 7L)))
    assert(TxLog.currentVersion(spark, replica2).get == after1 &&
      multiset(replica2) == multiset(primary),
      "replayed window must not re-apply")
    // drift refuses LOUDLY: a feed deleting rows the replica lacks
    import spark.implicits._
    val bogus = Seq(("zz", 99.0, "delete", 8L))
      .toDF("k", "v", "_change_type", "_commit_version")
    val e = intercept[IllegalArgumentException] {
      TxLog.applyChangeEvents(replica, bogus)
    }
    assert(e.getMessage.contains("drifted"), e.getMessage)
  }

  test("keyless feed on a CLONED table starts from version 0 (live rows through the cloned DVs)") {
    val srcDir = fresh("clone_src")
    val dstDir = fresh("clone_dst")
    TxLog.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      srcDir)                                                      // src v1
    TxLog.deleteWhere(spark, srcDir, col("k") === 2L,
      deletionVectors = true)                                      // src v2
    TxLog.clone(spark, srcDir, dstDir)                             // dst v1
    // the clone's files are its initial inserts, READ THROUGH the
    // cloned DV state: k=2 was dead at clone time and must not appear
    val feed = TxLog.changeFeed(spark, dstDir, 0L, 1L)
      .select("_change_type", "_commit_version", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(feed == Set(("insert", 1L, 1L), ("insert", 1L, 3L)),
      feed.toString)
  }

  test("format door keyless + TVF keyless + rename alignment") {
    val path = fresh("doors")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0))
      .toDF("k", "part", "v"), path, Some("part"))
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))
    TxLog.deleteWhere(spark, path, col("k") === 1L)                // v3
    // a RENAME between the change and the read: the feed serves the
    // NEW logical name (physical identity, the changes() rule)
    TxLog.renameColumn(spark, path, "v", "amount")                 // v4
    val viaScala = TxLog.changeFeed(spark, path, 2L, 4L)
    assert(viaScala.columns.contains("amount") &&
      !viaScala.columns.contains("v"),
      viaScala.columns.mkString(", "))
    assert(viaScala.filter(col("_change_type") === "delete")
      .select("amount").as[Double].collect().toSeq == Seq(1.0))
    val viaDoor = spark.read.format("graft-txlog")
      .option("path", path).option("readChangeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "4").load()
    assert(viaDoor.collect().map(_.toString).sorted.toSeq ==
      viaScala.collect().map(_.toString).sorted.toSeq,
      "format-door keyless CDF diverged from TxLog.changeFeed")
    val viaTvf = spark.sql(
      s"SELECT * FROM graft_txlog_cdf('$path', 2, 4)")
    assert(viaTvf.collect().map(_.toString).sorted.toSeq ==
      viaScala.collect().map(_.toString).sorted.toSeq,
      "TVF keyless CDF diverged from TxLog.changeFeed")
  }

  test("maxVersionsPerRead: chunked keyless reads union to exactly the uncapped feed") {
    val path = fresh("chunks")
    TxLog.create(Seq((1L, 1.0)).toDF("k", "v"), path)            // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                   // v2
    (2 to 6).foreach(i =>
      TxLog.append(Seq((i.toLong, i.toDouble)).toDF("k", "v"), path)) // v3..v7
    TxLog.deleteWhere(spark, path, col("k") === 2L)              // v8
    def read(from: Long, cap: Option[Long]) = {
      val r = spark.read.format("graft-txlog").option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", from.toString)
        .option("endingVersion", "8")
      cap.fold(r)(n => r.option("maxVersionsPerRead", n.toString)).load()
    }
    val whole = read(0L, None).collect().map(_.toString).sorted.toSeq
    // loop bounded chunks the way a backfill would: advance the start
    // to the previous chunk's capped end until caught up
    var fromV = 0L
    var chunked = Seq.empty[String]
    while (fromV < 8L) {
      val chunk = read(fromV, Some(3L))
      chunked ++= chunk.collect().map(_.toString)
      fromV = math.min(8L, fromV + 3L)
    }
    assert(chunked.sorted == whole,
      s"chunked reads diverged: ${chunked.size} vs ${whole.size} events")
  }

  test("the reference's no_gwas_result audit shape: keyless feed over the QC append table") {
    // gwasDB's no_gwas_result (R/gwas_ddl.sql:66-75) is exactly the
    // keyless audit row-set the r15 verdict cited: (kgp_id, study_id)
    // pairs with NO unique identity — a marker can fail QC in several
    // re-loads, so duplicates are legitimate rows. Maintained as a
    // CDF-declared TxLog table, each load's append flows as inserts
    // and a study's retention purge as deletes; a downstream QC
    // dashboard ingests O(changed rows) per poll with no key to join.
    val path = fresh("nogwas")
    TxLog.create(Seq(("1:100_A_T", 1), ("1:100_A_T", 1), ("2:200_G_C", 2))
      .toDF("kgp_id", "study_id"), path)                            // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                      // v2
    TxLog.append(Seq(("1:100_A_T", 1), ("3:300_T_G", 1))
      .toDF("kgp_id", "study_id"), path)                            // v3: re-load
    TxLog.deleteWhere(spark, path, col("study_id") === 1)           // v4: purge
    val events = TxLog.changeFeed(spark, path, 2L, 4L)
      .groupBy("_change_type", "_commit_version", "kgp_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(events == Set(
      ("insert", 3L, "1:100_A_T", 1L), ("insert", 3L, "3:300_T_G", 1L),
      ("delete", 4L, "1:100_A_T", 3L), // ALL THREE duplicates surface
      ("delete", 4L, "3:300_T_G", 1L)),
      s"audit feed: $events")
  }

  test("auto-compaction heals are invisible to the keyless feed") {
    val path = fresh("ac")
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"),
      path, Some("part"))
    TxLog.setProperties(spark, path, Map(
      TxLog.ChangeDataFeedProp -> "true",
      TxLog.AutoCompactProp -> "true"))
    // enough tiny appends to trip the small-file heal (default
    // threshold 8): the follow-on OPTIMIZE commit rewrites the
    // partition but changes no rows — the feed must carry exactly the
    // appended inserts and nothing else
    (1 to 9).foreach(i =>
      TxLog.append(Seq((i.toLong, "p0", i.toDouble)).toDF("k", "part", "v")
        .coalesce(1), path))
    val head = TxLog.currentVersion(spark, path).get
    val ops = TxLog.history(spark, path)
      .select("operation").as[String].collect()
    assert(ops.exists(_.startsWith("OPTIMIZE")),
      s"precondition: the heal must have fired ($ops)")
    val feed = TxLog.changeFeed(spark, path, 2L, head)
    assert(feed.count() == 9L,
      "the heal's rewrite must contribute no events")
    assert(feed.select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))
  }

  test("the keyless feed drives incremental view maintenance on a table with NO key") {
    val path = fresh("mv")
    // duplicate rows throughout — the keyed CDF (and therefore the
    // old Mv pipeline) cannot serve this table at all
    TxLog.create(Seq(("a", 1.0), ("a", 1.0), ("b", 2.0))
      .toDF("grp", "v"), path)                                     // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                     // v2
    var mv = Mv.aggregate(TxLog.read(spark, path, Some(2L)),
      Seq("grp"), Seq("v"))
    var last = 2L
    def advance(commit: => Long): Unit = {
      val v = commit
      mv = Mv.applyDelta(mv,
        TxLog.changeFeed(spark, path, last, v)
          .drop("_commit_version", "_commit_timestamp"),
        Seq("grp"), Seq("v"))
      last = v
    }
    advance(TxLog.append(Seq(("a", 3.0), ("c", 4.0)).toDF("grp", "v"), path))
    advance(TxLog.deleteWhere(spark, path,
      col("grp") === "a" && col("v") === 1.0)) // drops BOTH duplicates
    advance(TxLog.updateWhere(spark, path, Seq("v" -> "v + 100"),
      col("grp") === "b"))
    val got = mv.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Mv.aggregate(TxLog.read(spark, path), Seq("grp"), Seq("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"keyless-feed-maintained view diverged from the full recompute: " +
        s"$got vs $want")
  }

  test("schema evolution splits eras: pre-widen inserts pad the new column with nulls") {
    val path = fresh("eras")
    TxLog.create(Seq((1L, 1.0)).toDF("k", "v"), path)            // v1
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))                   // v2
    TxLog.append(Seq((2L, 2.0)).toDF("k", "v"), path)            // v3: old era
    TxLog.append(Seq((3L, 3.0, "x")).toDF("k", "v", "tag"), path,
      evolveSchema = true)                                       // v4: widened
    TxLog.deleteWhere(spark, path, col("k") === 1L)              // v5: record era
    val feed = TxLog.changeFeed(spark, path, 2L, 5L)
    val got = feed.collect().map(r => (r.getLong(0),
      Option(r.get(2)).map(_.toString).orNull, r.getString(3),
      r.getLong(4))).toSet
    assert(got == Set(
      (2L, null, "insert", 3L),   // pre-widen era: tag pads null
      (3L, "x", "insert", 4L),    // widened era carries the new column
      (1L, null, "delete", 5L)),  // the record era (v1's row predates tag)
      s"era-split feed: $got")
  }

  test("the feed's meta column names are reserved on declared tables") {
    val path = fresh("resv")
    TxLog.create(Seq((1L, "x")).toDF("k", "_change_type"), path)
    // declaring over a colliding schema refuses
    val e1 = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path,
        Map(TxLog.ChangeDataFeedProp -> "true"))
    }
    assert(e1.getMessage.contains("reserves"), e1.getMessage)
    // a declared table refuses growing/renaming INTO the reserved names
    val clean = fresh("resv2")
    TxLog.create(Seq((1L, 1.0)).toDF("k", "v"), clean)
    TxLog.setProperties(spark, clean,
      Map(TxLog.ChangeDataFeedProp -> "true"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.addColumn(spark, clean, "_commit_version", "BIGINT")
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, clean, "v", "_change_type")
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
    // and the pre-create door refuses too
    intercept[IllegalArgumentException] {
      TxLog.validateProperties(
        Map(TxLog.ChangeDataFeedProp -> "true"),
        Some(Set("k", "_commit_timestamp")))
    }
  }

  test("vacuum keeps retained change records, sweeps expired ones") {
    val path = fresh("vac")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path)
    TxLog.setProperties(spark, path,
      Map(TxLog.ChangeDataFeedProp -> "true"))
    TxLog.deleteWhere(spark, path, col("k") === 1L)                // v3
    TxLog.updateWhere(spark, path, Seq("v" -> "v * 2"),
      col("k") === 2L)                                             // v4
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val cdcRoot = new org.apache.hadoop.fs.Path(path, "_change_data")
    assert(fs.listStatus(cdcRoot).length == 2, "two captured commits")
    // retain everything: nothing sweeps
    TxLog.vacuum(spark, path, keepVersions = 10)
    assert(fs.listStatus(cdcRoot).length == 2)
    // age the records out of the stale-write guard, then retain only
    // the head: v3's record expires with its version
    fs.listStatus(cdcRoot).foreach(st =>
      fs.setTimes(st.getPath, System.currentTimeMillis() - 100L * 3600 * 1000, -1))
    spark.conf.set("graft.txlog.staleWriteHours", "0.000001")
    try TxLog.vacuum(spark, path, keepVersions = 1)
    finally spark.conf.unset("graft.txlog.staleWriteHours")
    val left = fs.listStatus(cdcRoot).map(_.getPath.getName).toSet
    assert(left.size == 1,
      s"only the head version's record survives: $left")
    // the head's own feed window still serves
    assert(TxLog.changeFeed(spark, path, 3L, 4L).count() == 2L)
  }
}
