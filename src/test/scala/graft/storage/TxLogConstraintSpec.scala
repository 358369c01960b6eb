package graft.storage

import graft.SparkSpec

/** Table CHECK constraints — Delta's `ALTER TABLE ... ADD CONSTRAINT`
  * shape: named boolean expressions persisted in every commit's
  * metadata and enforced on every data-adding commit. These specs pin
  * the ENFORCEMENT contract (a violating commit is refused atomically
  * — version unchanged, nothing staged), SQL NULL semantics (unknown
  * is not a violation), and that constraints travel with table state
  * (checkpoint, clone, restore) exactly like the schema does.
  */
class TxLogConstraintSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_constraint_$tag"
    val f = new java.io.File(d)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)
    d
  }

  private def dataFileCount(path: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(s"$path/data"))
  }

  test("a violating append is refused atomically: named error, version unchanged, nothing staged") {
    import spark.implicits._
    val path = freshDir("refuse")
    TxLog.create(Seq((1L, 10.0, "a"), (2L, 20.0, "a")).toDF("k", "amt", "part"),
      path, Some("part"))
    val v = TxLog.addConstraint(spark, path, "amt_positive", "amt > 0")
    assert(v == 2L, "constraint add commits a metadata version")
    assert(TxLog.constraintsOf(spark, path) ==
      Seq("amt_positive" -> "amt > 0"))
    val filesBefore = dataFileCount(path)
    val e = intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((3L, -5.0, "a")).toDF("k", "amt", "part"), path)
    }
    assert(e.getMessage.contains("amt_positive"), s"name the constraint: ${e.getMessage}")
    assert(e.getMessage.contains("amt > 0"), "include the CHECK expression")
    assert(TxLog.currentVersion(spark, path).contains(2L),
      "refused commit must not advance the version")
    assert(dataFileCount(path) == filesBefore,
      "refusal happens BEFORE staging — no orphan data files")
    // a passing append still flows
    assert(TxLog.append(Seq((3L, 5.0, "a")).toDF("k", "amt", "part"), path) == 3L)
    assert(TxLog.read(spark, path).count() == 3L)
  }

  test("NULL is not a violation (SQL CHECK semantics), and multiple constraints all bind") {
    import spark.implicits._
    val path = freshDir("nulls")
    TxLog.create(
      Seq((1L, Some(10.0), "a")).toDF("k", "amt", "part"), path, Some("part"))
    TxLog.addConstraint(spark, path, "amt_positive", "amt > 0")
    TxLog.addConstraint(spark, path, "k_nonzero", "k <> 0")
    // NULL amt evaluates the check to NULL -> passes (unknown, not false)
    TxLog.append(Seq((2L, Option.empty[Double], "a")).toDF("k", "amt", "part"), path)
    assert(TxLog.read(spark, path).count() == 2L)
    // a row violating only the SECOND constraint is still refused
    val e = intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((0L, Some(1.0), "a")).toDF("k", "amt", "part"), path)
    }
    assert(e.getMessage.contains("k_nonzero") && !e.getMessage.contains("amt_positive"),
      s"report exactly the failed constraint: ${e.getMessage}")
  }

  test("adding a constraint validates EXISTING data; dropConstraint lifts enforcement") {
    import spark.implicits._
    val path = freshDir("existing")
    TxLog.create(Seq((1L, -1.0, "a")).toDF("k", "amt", "part"), path, Some("part"))
    val e = intercept[TxLog.ConstraintViolationException] {
      TxLog.addConstraint(spark, path, "amt_positive", "amt > 0")
    }
    assert(e.getMessage.contains("existing data"), e.getMessage)
    assert(TxLog.constraintsOf(spark, path).isEmpty,
      "failed add must not register the constraint")
    // delete the offending row, add succeeds, then drop re-opens the gate
    TxLog.deleteWhere(spark, path, org.apache.spark.sql.functions.expr("amt < 0"))
    TxLog.addConstraint(spark, path, "amt_positive", "amt > 0")
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((2L, -2.0, "a")).toDF("k", "amt", "part"), path)
    }
    TxLog.dropConstraint(spark, path, "amt_positive")
    TxLog.append(Seq((2L, -2.0, "a")).toDF("k", "amt", "part"), path)
    assert(TxLog.constraintsOf(spark, path).isEmpty)
    intercept[IllegalArgumentException] {
      TxLog.dropConstraint(spark, path, "amt_positive") // already gone
    }
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, path, "bad name!", "amt > 0") // bad identifier
    }
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, path, "coin_flip", "rand() > 0.5") // nondeterministic
    }
  }

  test("mergeInto and appendBatch vet the incoming side; the streaming sink inherits the gate") {
    import spark.implicits._
    val path = freshDir("merge")
    TxLog.create(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "amt", "part"),
      path, Some("part"))
    TxLog.addConstraint(spark, path, "amt_positive", "amt > 0")
    intercept[TxLog.ConstraintViolationException] {
      TxLog.mergeInto(path, Seq((1L, -10.0, "a")).toDF("k", "amt", "part"),
        keys = Seq("k"))
    }
    // a passing merge updates in place
    TxLog.mergeInto(path, Seq((1L, 11.0, "a")).toDF("k", "amt", "part"),
      keys = Seq("k"))
    assert(TxLog.read(spark, path).filter("k = 1").select("amt")
      .collect().head.getDouble(0) == 11.0)
    intercept[TxLog.ConstraintViolationException] {
      TxLog.appendBatch(Seq((9L, -1.0, "a")).toDF("k", "amt", "part"), path, 0L)
    }
    intercept[TxLog.ConstraintViolationException] {
      TxLog.replacePartitions(Seq((7L, -3.0, "b")).toDF("k", "amt", "part"),
        path, Seq("b"))
    }
    // applyChanges vets upserts; deletes of "bad" rows still flow
    val feed = Seq((2L, -20.0, "b", "update")).toDF("k", "amt", "part", "_change_type")
    intercept[TxLog.ConstraintViolationException] {
      TxLog.applyChanges(path, feed, keys = Seq("k"))
    }
    val delFeed = Seq((2L, 20.0, "b", "delete")).toDF("k", "amt", "part", "_change_type")
    TxLog.applyChanges(path, delFeed, keys = Seq("k"))
    assert(TxLog.read(spark, path).count() == 1L)
  }

  test("constraints travel with table state: checkpoint round-trip, clone, and restore reverting the set") {
    import spark.implicits._
    val path = freshDir("travel")
    spark.conf.set("graft.txlog.checkpointInterval", "2")
    try {
      TxLog.create(Seq((1L, 10.0, "a")).toDF("k", "amt", "part"), path, Some("part"))
      val vAdd = TxLog.addConstraint(spark, path, "amt_positive", "amt > 0") // v2 (+ checkpoint)
      TxLog.append(Seq((2L, 5.0, "a")).toDF("k", "amt", "part"), path) // v3
      // cold read (cache flushed) resolves through the checkpoint at v2;
      // constraints must come back from the commit metadata
      TxLog.flushSnapshotCacheForTesting()
      assert(TxLog.constraintsOf(spark, path) == Seq("amt_positive" -> "amt > 0"))
      intercept[TxLog.ConstraintViolationException] {
        TxLog.append(Seq((3L, -1.0, "a")).toDF("k", "amt", "part"), path)
      }
      // clone carries the constraint set to the new table
      val cloneDir = freshDir("travel_clone")
      TxLog.clone(spark, path, cloneDir)
      assert(TxLog.constraintsOf(spark, cloneDir) == Seq("amt_positive" -> "amt > 0"))
      intercept[TxLog.ConstraintViolationException] {
        TxLog.append(Seq((9L, -9.0, "a")).toDF("k", "amt", "part"), cloneDir)
      }
      // restore to BEFORE the add reverts the constraint set with the data
      TxLog.restore(spark, path, vAdd - 1)
      assert(TxLog.constraintsOf(spark, path).isEmpty,
        "restore is a full table-state rollback — constraints included")
      TxLog.append(Seq((4L, -4.0, "a")).toDF("k", "amt", "part"), path)
      // historical versions still report the set that was in force
      assert(TxLog.constraintsOf(spark, path, Some(vAdd)) ==
        Seq("amt_positive" -> "amt > 0"))
    } finally spark.conf.unset("graft.txlog.checkpointInterval")
  }

  test("SQL surface: ALTER ADD/DROP CONSTRAINT verbs and the graft_txlog_constraints TVF") {
    val path = freshDir("sql")
    graft.tools.Sql.exec(spark,
      s"TXLOG CREATE '$path' PARTITION BY part AS " +
        "SELECT 1L AS k, CAST(10.0 AS DOUBLE) AS amt, 'a' AS part")
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' ADD CONSTRAINT amt_positive CHECK (amt > 0)")
    val listed = spark.sql(
      s"SELECT * FROM graft_txlog_constraints('$path')").collect()
    assert(listed.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("amt_positive", "CHECK", "amt > 0")))
    intercept[TxLog.ConstraintViolationException] {
      graft.tools.Sql.exec(spark,
        s"TXLOG APPEND INTO '$path' SELECT 2L AS k, CAST(-1.0 AS DOUBLE) AS amt, 'a' AS part")
    }
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' DROP CONSTRAINT amt_positive")
    graft.tools.Sql.exec(spark,
      s"TXLOG APPEND INTO '$path' SELECT 2L AS k, CAST(-1.0 AS DOUBLE) AS amt, 'a' AS part")
    assert(TxLog.read(spark, path).count() == 2L)
    assert(spark.sql(s"SELECT * FROM graft_txlog_constraints('$path')").isEmpty)
    // the version argument reaches back to when the constraint held
    assert(spark.sql(s"SELECT * FROM graft_txlog_constraints('$path', 2)")
      .count() == 1L)
  }

  test("UNIQUE constraint: the write-time PK gate — in-batch dups, table collisions, existing dups all refuse") {
    import spark.implicits._
    val path = freshDir("unique")
    TxLog.create(Seq((1L, 10L, "a", 1.0), (1L, 20L, "a", 2.0), (2L, 10L, "b", 3.0))
      .toDF("kgp", "study", "part", "v"), path, Some("part"))
    // composite key, the reference's gwas PK shape (kgp_id, study_id)
    TxLog.addUniqueConstraint(spark, path, "pk_gwas", Seq("kgp", "study"))
    assert(TxLog.uniquesOf(spark, path) == Seq("pk_gwas" -> Seq("kgp", "study")))
    val vBefore = TxLog.currentVersion(spark, path).get
    // in-batch duplicate
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((5L, 5L, "a", 1.0), (5L, 5L, "b", 2.0))
        .toDF("kgp", "study", "part", "v"), path)
    }
    // collision with a key already in the table
    val e = intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((1L, 20L, "b", 9.0)).toDF("kgp", "study", "part", "v"), path)
    }
    assert(e.getMessage.contains("pk_gwas") &&
      e.getMessage.contains("already exists"), e.getMessage)
    assert(TxLog.currentVersion(spark, path).contains(vBefore),
      "refused commits must not advance the version")
    // NULL keys refuse outright: PRIMARY-KEY semantics, not bare UNIQUE
    // (SQL's null-incomparability would leave nulls half-checked here)
    val eNull = intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((Option.empty[Long], 9L, "a", 1.0))
        .toDF("kgp", "study", "part", "v"), path)
    }
    assert(eNull.getMessage.contains("NULL key"), eNull.getMessage)
    // fresh keys flow
    TxLog.append(Seq((3L, 10L, "a", 4.0)).toDF("kgp", "study", "part", "v"), path)
    assert(TxLog.read(spark, path).count() == 4L)
    // merge (upsert shape) may UPDATE an existing key in place...
    TxLog.mergeInto(path, Seq((1L, 10L, "a", 99.0)).toDF("kgp", "study", "part", "v"),
      keys = Seq("kgp", "study"))
    assert(TxLog.read(spark, path)
      .filter("kgp = 1 AND study = 10").head().getDouble(3) == 99.0)
    // ...but an update batch repeating the unique key within itself refuses
    intercept[TxLog.ConstraintViolationException] {
      TxLog.mergeInto(path,
        Seq((7L, 7L, "a", 1.0), (7L, 7L, "a", 2.0))
          .toDF("kgp", "study", "part", "v"),
        keys = Seq("kgp", "study"), preValidated = true)
    }
    // shared DROP lifts it
    TxLog.dropConstraint(spark, path, "pk_gwas")
    TxLog.append(Seq((1L, 20L, "b", 9.0)).toDF("kgp", "study", "part", "v"), path)
    // re-add must now refuse: the table holds a duplicate
    intercept[TxLog.ConstraintViolationException] {
      TxLog.addUniqueConstraint(spark, path, "pk_gwas", Seq("kgp", "study"))
    }
    assert(TxLog.uniquesOf(spark, path).isEmpty)
  }

  test("UNIQUE via SQL: ALTER ADD ... UNIQUE verb, TVF listing with types, replace-scope collision exemption") {
    import spark.implicits._
    val path = freshDir("unique_sql")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v"),
      path, Some("part"))
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' ADD CONSTRAINT pk_k UNIQUE (k)")
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' ADD CONSTRAINT v_pos CHECK (v > 0)")
    val listed = spark.sql(s"SELECT * FROM graft_txlog_constraints('$path')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(listed == Set(("pk_k", "UNIQUE", "k"), ("v_pos", "CHECK", "v > 0")),
      listed.toString)
    // replacePartitions: replacing partition a with a row whose key k=1
    // currently lives ONLY in partition a is NOT a collision (that row
    // is leaving in the same commit)
    TxLog.replacePartitions(Seq((1L, "a", 5.0)).toDF("k", "part", "v"),
      path, Seq("a"))
    assert(TxLog.read(spark, path).filter("k = 1").head().getDouble(2) == 5.0)
    // but replacing partition a with partition B's key IS one
    intercept[TxLog.ConstraintViolationException] {
      TxLog.replacePartitions(Seq((2L, "a", 7.0)).toDF("k", "part", "v"),
        path, Seq("a"))
    }
  }

  test("UNIQUE gate holds under CONCURRENT appends: racing same-key writers admit exactly one") {
    import spark.implicits._
    val path = freshDir("unique_race")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    TxLog.addUniqueConstraint(spark, path, "pk_k", Seq("k"))
    // four threads all try to append key 42. Each passes its own
    // snapshot probe (they start before anyone commits); the rename
    // race serializes them, and the REBASE REVALIDATION must catch the
    // key the winner landed — without it every thread would commit and
    // the table would silently hold four rows for a declared-unique key
    // (ADVICE r8, high).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = (0 until 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        def call(): Either[Throwable, Long] = {
          gate.await()
          try Right(TxLog.append(
            Seq((42L, "a", i.toDouble)).toDF("k", "part", "v"), path))
          catch { case t: Throwable => Left(t) }
        }
      })
    }
    gate.countDown()
    val outcomes = results.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val wins = outcomes.collect { case Right(v) => v }
    val losses = outcomes.collect { case Left(t) => t }
    assert(wins.size == 1, s"expected exactly one winner, got $outcomes")
    losses.foreach(t => assert(
      t.isInstanceOf[TxLog.ConstraintViolationException] ||
        t.isInstanceOf[TxLog.CommitConflictException],
      s"loser failed with ${t.getClass}: ${t.getMessage}"))
    assert(losses.exists(_.isInstanceOf[TxLog.ConstraintViolationException]),
      "at least one racer should be caught by the rebase revalidation " +
        s"(got ${losses.map(_.getClass.getSimpleName)})")
    val k42 = TxLog.read(spark, path).filter("k = 42").count()
    assert(k42 == 1L, s"declared-unique key admitted $k42 times")
  }

  test("minWriter gates stale writers: constraints raise the demand to 2; a higher demand refuses writes, reads still work") {
    import spark.implicits._
    val path = freshDir("minwriter")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    assert(TxLog.manifest(spark, path, 1L).minWriter == 1)
    TxLog.addConstraint(spark, path, "v_pos", "v > 0")
    // the first constraint raises the writer gate (Delta's
    // minWriterVersion contract): a future generation-1 build must
    // refuse to append un-vetted rows, not half-enforce
    assert(TxLog.manifest(spark, path, 2L).minWriter == 2)
    // sticky across data commits AND across dropping the constraint
    TxLog.append(Seq((2L, "a", 2.0)).toDF("k", "part", "v"), path)
    assert(TxLog.manifest(spark, path, 3L).minWriter == 2)
    TxLog.dropConstraint(spark, path, "v_pos")
    assert(TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).minWriter == 2)
    // a table demanding a NEWER writer generation than this build:
    // writes refuse loudly, reads are untouched
    val head = TxLog.currentVersion(spark, path).get
    val commit = new java.io.File(s"$path/_manifests/v$head.json")
    val txt = new String(java.nio.file.Files.readAllBytes(commit.toPath), "UTF-8")
    val doctored =
      if (txt.contains("\"minWriter\""))
        txt.replaceFirst("\"minWriter\"\\s*:\\s*\\d+", "\"minWriter\" : 99")
      else txt.replaceFirst("\"version\"", "\"minWriter\" : 99, \"version\"")
    java.nio.file.Files.write(commit.toPath, doctored.getBytes("UTF-8"))
    // the local FS keeps a checksum sidecar the nio rewrite bypasses
    new java.io.File(s"$path/_manifests/.v$head.json.crc").delete()
    TxLog.flushSnapshotCacheForTesting()
    val e = intercept[UnsupportedOperationException] {
      TxLog.append(Seq((9L, "a", 9.0)).toDF("k", "part", "v"), path)
    }
    assert(e.getMessage.contains("writer generation 99"), e.getMessage)
    assert(TxLog.read(spark, path).count() == 2L, "reads must stay ungated")
  }
}
