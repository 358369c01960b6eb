package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DEFAULT and GENERATED columns — the last commonly-hit Delta DDL
  * family: metadata-only policies that FILL omitted columns on the
  * INSERT-shaped writes (append family, INSERT INTO, streaming sink)
  * and, for GENERATED, vet provided values against the generation
  * expression. Policies ride the constraint channel under reserved
  * `__default__`/`__generated__` names, so they persist in every
  * commit, survive checkpoints and clone, and restore reverts them
  * with the rest of the table state. Existing rows are never
  * backfilled (standard SQL: DEFAULT binds at write).
  */
class TxLogDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_def_$tag").toString + "/tbl"

  test("SET DEFAULT fills omitted columns; explicit values win; DROP DEFAULT stops") {
    val path = freshPath("basic")
    TxLog.create(Seq((1L, "a", "x")).toDF("k", "v", "tag"), path)
    TxLog.setColumnDefault(spark, path, "tag", "'auto'")
    // omitted column -> default
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), path)
    // provided column -> untouched
    TxLog.append(Seq((3L, "c", "manual")).toDF("k", "v", "tag"), path)
    assert(TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "a", "x"), (2L, "b", "auto"), (3L, "c", "manual")))
    assert(TxLog.columnPolicies(spark, path) ==
      Seq(("tag", "default", "'auto'")))
    TxLog.dropColumnDefault(spark, path, "tag")
    // with no default, an omitted column reverts to the null-padding
    // contract every append has
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), path)
    assert(TxLog.read(spark, path).filter(col("k") === 4L)
      .select("tag").as[Option[String]].head().isEmpty)
  }

  test("an unknown extra column refuses even when a policy column is omitted") {
    val path = freshPath("unknowncol")
    TxLog.create(Seq((1L, "a", "x")).toDF("k", "v", "tag"), path)
    TxLog.setColumnDefault(spark, path, "tag", "'auto'")
    // omitting `tag` (filled by policy) must NOT open a side door for
    // `rogue`: the same loud schema refusal as when no policy fires
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, "b", "smuggled")).toDF("k", "v", "rogue"), path)
    }
    assert(e.getMessage.contains("rogue"), e.getMessage)
    assert(TxLog.read(spark, path).count() == 1)
  }

  test("ADD COLUMN ... DEFAULT: old rows read null, new appends fill — via the SQL verbs") {
    val path = freshPath("addcol")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' ADD COLUMN tag string DEFAULT 'filled'")
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), path)
    assert(TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Option[String])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "b", Some("filled"))),
      "metadata-only ADD: old rows null, new appends default")
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' ALTER COLUMN tag SET DEFAULT 'v2'")
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), path)
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' ALTER COLUMN tag DROP DEFAULT")
    assert(TxLog.read(spark, path).filter(col("k") === 3L)
      .select("tag").as[String].head() == "v2")
  }

  test("GENERATED columns compute on omission and vet provided values") {
    val path = freshPath("gen")
    TxLog.create(Seq((8L, "a")).toDF("k", "v"), path)
    TxLog.addColumn(spark, path, "k_bucket", "bigint",
      generatedAs = Some("k % 4"))
    // omitted -> computed
    TxLog.append(Seq((9L, "b"), (10L, "c")).toDF("k", "v"), path)
    assert(TxLog.read(spark, path).orderBy("k")
      .select("k", "k_bucket").as[(Long, Option[Long])].collect().toSeq ==
      Seq((8L, None), (9L, Some(1L)), (10L, Some(2L))),
      "pre-existing row reads null; appended rows compute")
    // provided-but-WRONG refuses (the generated invariant)
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((11L, "d", 99L)).toDF("k", "v", "k_bucket"), path)
    }
    // provided-and-right passes (a rewrite carrying computed values)
    TxLog.append(Seq((12L, "e", 0L)).toDF("k", "v", "k_bucket"), path)
    assert(TxLog.read(spark, path).count() == 4)
  }

  test("policy validation: no column refs in DEFAULT, determinism, reserved names") {
    val path = freshPath("vet")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)
    // a DEFAULT referencing a column is not SQL DEFAULT semantics
    intercept[Exception] { TxLog.setColumnDefault(spark, path, "v", "k + 1") }
    // nondeterministic defaults would make replayed batches diverge
    intercept[Exception] { TxLog.setColumnDefault(spark, path, "v", "uuid()") }
    // the reserved namespace is closed to user constraints
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, path, "__default__v", "true")
    }
    intercept[IllegalArgumentException] {
      TxLog.dropConstraint(spark, path, "__default__v")
    }
    // GENERATED and DEFAULT are mutually exclusive on one column
    TxLog.addColumn(spark, path, "g", "bigint", generatedAs = Some("k * 2"))
    intercept[Exception] { TxLog.setColumnDefault(spark, path, "g", "0") }
    // renaming/dropping respects policies
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "g", "g2")
    }
    intercept[IllegalArgumentException] { // k is referenced by g's expr
      TxLog.dropColumn(spark, path, "k")
    }
    TxLog.dropColumn(spark, path, "g") // drops the policy with the column
    assert(TxLog.columnPolicies(spark, path).isEmpty)
  }

  test("plain SQL: CREATE TABLE with DEFAULT + INSERT column list through the catalog") {
    val w = java.nio.file.Files.createTempDirectory("graft_def_cat").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try {
      spark.sql("CREATE TABLE graft.def_t (k BIGINT, v STRING, " +
        "tag STRING DEFAULT 'fresh')")
      assert(TxLog.columnPolicies(spark, s"$w/def_t") ==
        Seq(("tag", "default", "'fresh'")))
      // Spark's own resolver fills the omitted defaulted column
      spark.sql("INSERT INTO graft.def_t (k, v) VALUES (1, 'a')")
      spark.sql("INSERT INTO graft.def_t VALUES (2, 'b', 'manual')")
      assert(spark.sql("SELECT k, tag FROM graft.def_t ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "fresh"), (2L, "manual")))
      spark.sql("ALTER TABLE graft.def_t ALTER COLUMN tag SET DEFAULT 'v2'")
      spark.sql("INSERT INTO graft.def_t (k, v) VALUES (3, 'c')")
      assert(spark.sql("SELECT tag FROM graft.def_t WHERE k = 3")
        .as[String].head() == "v2")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }

  test("MERGE INSERT * fills omitted DEFAULT and computes omitted GENERATED columns") {
    import graft.storage.TxLog.MergeClause
    val path = freshPath("mergefill")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)
    TxLog.addColumn(spark, path, "tag", "string", default = Some("'merged'"))
    TxLog.addColumn(spark, path, "k2", "bigint", generatedAs = Some("k * 2"))
    // source carries only (k, v): the policy columns may be omitted
    val src = Seq((1L, "upd"), (5L, "new")).toDF("k", "v")
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("v" -> "src.v"))),
      notMatched = Seq(MergeClause(None, "insert")))
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Option[String], Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, "upd", None, None),           // pre-policy row: updated, stays null
      (5L, "new", Some("merged"), Some(10L))), // insert: filled + computed
      s"got $out")
    // a column with NO policy still refuses omission
    TxLog.addColumn(spark, path, "plain", "string")
    intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, Seq((9L, "x")).toDF("k", "v"), Seq("k"),
        notMatched = Seq(MergeClause(None, "insert")))
    }
    // the SQL MERGE surface inherits the fill (same engine path);
    // 'plain' has no policy so the source must carry it
    Seq((7L, "sql", "p")).toDF("k", "v", "plain")
      .createOrReplaceTempView("mw_fill_src")
    graft.tools.Sql.exec(spark,
      s"TXLOG MERGE INTO '$path' ON k USING (SELECT * FROM mw_fill_src) " +
        "WHEN NOT MATCHED THEN INSERT")
    val r7 = TxLog.read(spark, path).filter(col("k") === 7L)
      .select("tag", "k2").as[(String, Long)].head()
    assert(r7 == (("merged", 14L)), r7.toString)
  }

  test("policies survive restore (full table-state rollback) and the streaming sink fills") {
    val path = freshPath("restore")
    TxLog.create(Seq((1L, "a", "x")).toDF("k", "v", "tag"), path)
    TxLog.setColumnDefault(spark, path, "tag", "'auto'") // v2
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), path)    // v3
    TxLog.restore(spark, path, 1L)                       // v4: no default
    TxLog.append(Seq((9L, "z")).toDF("k", "v"), path)    // pads null
    assert(TxLog.read(spark, path).filter(col("k") === 9L)
      .select("tag").as[Option[String]].head().isEmpty,
      "restored-away default must not fill")
    TxLog.restore(spark, path, 3L) // default back in force
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), path)
    assert(TxLog.read(spark, path).filter(col("k") === 3L)
      .select("tag").as[String].head() == "auto")
  }

  // ---- GENERATED ALWAYS AS IDENTITY ----

  private def emptyIdTable(path: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING")
    TxLog.create(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), path)
    TxLog.setColumnIdentity(spark, path, "id")
  }

  test("IDENTITY: appends allocate dense disjoint ranges; explicit writes refuse") {
    val path = freshPath("idbasic")
    emptyIdTable(path)
    TxLog.append(Seq("a", "b", "c").toDF("v"), path)
    TxLog.append(Seq("d", "e").toDF("v"), path)
    val out = TxLog.read(spark, path).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L), s"got $out")
    assert(out.map(_._2).sorted == Seq("a", "b", "c", "d", "e"))
    // first batch takes [1,3], second [4,5] — ranges never interleave
    assert(out.take(3).map(_._2).toSet == Set("a", "b", "c"))
    // explicit values refuse (GENERATED ALWAYS)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((99L, "z")).toDF("id", "v"), path)
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    // an all-null provided column counts as omitted (the SQL door)
    TxLog.append(Seq(("f", null.asInstanceOf[java.lang.Long])).toDF("v", "id")
      .select(col("id").cast("bigint").as("id"), col("v")), path)
    assert(TxLog.read(spark, path).filter(col("v") === "f")
      .select("id").as[Long].head() == 6L)
    assert(TxLog.columnPolicies(spark, path) ==
      Seq(("id", "identity", "step=1 next=7")))
  }

  test("IDENTITY: start/step honored; adoption on a non-empty table") {
    val path = freshPath("idstep")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING")
    TxLog.create(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), path)
    TxLog.setColumnIdentity(spark, path, "id", start = 100L, step = 10L)
    TxLog.append(Seq("a", "b").toDF("v"), path)
    assert(TxLog.read(spark, path).select("id").as[Long].collect().sorted
      .toSeq == Seq(100L, 110L))
    // adoption: existing ids keep, the mark starts above their max
    val path2 = freshPath("idadopt")
    TxLog.create(Seq((7L, "x"), (9L, "y")).toDF("id", "v"), path2)
    TxLog.setColumnIdentity(spark, path2, "id")
    TxLog.append(Seq("z").toDF("v"), path2)
    assert(TxLog.read(spark, path2).select("id").as[Long].collect().sorted
      .toSeq == Seq(7L, 9L, 10L))
    // NULLs in existing rows refuse adoption
    val path3 = freshPath("idnull")
    TxLog.create(Seq((Some(1L), "x"), (None, "y")).toDF("id", "v"), path3)
    val e = intercept[IllegalArgumentException] {
      TxLog.setColumnIdentity(spark, path3, "id")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("IDENTITY: concurrent appends allocate disjoint ranges (OCC re-fill)") {
    val path = freshPath("idrace")
    emptyIdTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val writers = (1 to 4).map { w =>
      Future {
        TxLog.append(Seq(s"w$w-1", s"w$w-2", s"w$w-3").toDF("v"), path)
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    val ids = TxLog.read(spark, path).select("id").as[Long].collect().toSeq
    assert(ids.size == 12, s"lost rows: $ids")
    assert(ids.distinct.size == 12, s"duplicate ids under race: $ids")
    // dense overall: every race re-fills from the advanced mark
    assert(ids.sorted == (1L to 12L), s"non-dense allocation: ${ids.sorted}")
  }

  test("IDENTITY: rewrite verbs respect GENERATED ALWAYS") {
    val path = freshPath("idverbs")
    emptyIdTable(path)
    TxLog.append(Seq("a", "b").toDF("v"), path)
    // UPDATE SET on the identity column refuses
    val e1 = intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, path, Seq("id" -> "99"), col("v") === "a")
    }
    assert(e1.getMessage.contains("IDENTITY"))
    // mergeWhen: source may not carry the column; INSERT * allocates
    val e2 = intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, Seq((5L, "c")).toDF("id", "v"), Seq("v"),
        notMatched = Seq(TxLog.MergeClause(None, "insert")))
    }
    assert(e2.getMessage.contains("IDENTITY"))
    TxLog.mergeWhen(path, Seq("a", "c").toDF("v"), Seq("v"),
      matched = Seq(TxLog.MergeClause(None, "update", Seq("v" -> "src.v"))),
      notMatched = Seq(TxLog.MergeClause(None, "insert")))
    val out = TxLog.read(spark, path).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L), s"got $out")
    assert(out.map(_._2).toSet == Set("a", "b", "c"))
    // deleted ids are never re-issued: the mark only advances
    TxLog.deleteWhere(spark, path, col("v") === "c")
    TxLog.append(Seq("d").toDF("v"), path)
    assert(TxLog.read(spark, path).filter(col("v") === "d")
      .select("id").as[Long].head() == 4L)
    // a CDC feed carries explicit ids — refused (replicas of identity
    // tables should not re-declare IDENTITY; the source allocated)
    val e3 = intercept[IllegalArgumentException] {
      TxLog.applyChanges(path,
        Seq((9L, "x", "insert")).toDF("id", "v", "_change_type"), Seq("id"))
    }
    assert(e3.getMessage.contains("IDENTITY"), e3.getMessage)
  }

  test("IDENTITY under the idempotent lanes: replays never re-allocate") {
    val path = freshPath("idlanes")
    emptyIdTable(path)
    // streaming micro-batch lane: batch 1 commits, its replay skips
    // BEFORE allocating (the mark must not move), batch 2 continues
    TxLog.appendBatch(Seq("a", "b").toDF("v"), path, batchId = 1L)
    TxLog.appendBatch(Seq("a", "b").toDF("v"), path, batchId = 1L) // replay
    TxLog.appendBatch(Seq("c").toDF("v"), path, batchId = 2L)
    val ids = TxLog.read(spark, path).select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    // per-app txn lane: same contract
    TxLog.appendTxn(Seq("d").toDF("v"), path, "app", 1L)
    TxLog.appendTxn(Seq("d").toDF("v"), path, "app", 1L) // replay
    val ids2 = TxLog.read(spark, path).select("id").as[Long].collect().sorted
    assert(ids2.toSeq == Seq(1L, 2L, 3L, 4L), s"got ${ids2.toSeq}")
    assert(TxLog.columnPolicies(spark, path) ==
      Seq(("id", "identity", "step=1 next=5")))
  }

  test("INSERT OVERWRITE keeps the governance contract: policies vet, identity fills") {
    val w = java.nio.file.Files.createTempDirectory("graft_idow").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try {
      spark.sql("CREATE TABLE graft.owt (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, v DOUBLE)")
      spark.sql("ALTER TABLE graft.owt ADD CONSTRAINT pos CHECK (v >= 0)")
      spark.sql("INSERT INTO graft.owt (v) VALUES (1.0), (2.0)")
      // overwrite = truncate + insert: identity keeps filling, the mark
      // never regresses past ids the table already issued
      spark.sql("INSERT OVERWRITE graft.owt (v) VALUES (9.0)")
      val out = spark.sql("SELECT id, v FROM graft.owt")
        .as[(Long, Double)].collect().toSeq
      assert(out == Seq((3L, 9.0)), s"got $out")
      // the carried CHECK still vets overwrite rows
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.owt (v) VALUES (-5.0)") }
      assert(e.getMessage.contains("pos"), e.getMessage)
      assert(spark.sql("SELECT count(*) FROM graft.owt").head().getLong(0)
        == 1L, "a refused overwrite must leave the table unchanged")
      // and the NEXT plain insert still allocates (the policy survived)
      spark.sql("INSERT INTO graft.owt (v) VALUES (4.0)")
      val ids = spark.sql("SELECT id FROM graft.owt ORDER BY id")
        .as[Long].collect().toSeq
      assert(ids == Seq(3L, 4L), s"got $ids")
      assert(graft.storage.TxLog.columnPolicies(spark, s"$w/owt")
        .exists(_._2 == "identity"), "identity policy must survive overwrite")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }

  test("policy cross-guards: no DEFAULT on identity; failed identity CREATE leaves nothing") {
    val path = freshPath("idguard")
    emptyIdTable(path)
    // a DEFAULT would fill an explicit value the identity gate refuses
    val e = intercept[IllegalArgumentException] {
      TxLog.setColumnDefault(spark, path, "id", "42")
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    // SQL: an identity column driving the partition layout refuses
    // UPFRONT — and the refused CREATE registers nothing
    val w = java.nio.file.Files.createTempDirectory("graft_idg2").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try {
      val e2 = intercept[Exception] {
        spark.sql("CREATE TABLE graft.idpart (" +
          "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) " +
          "PARTITIONED BY (bucket(4, id))")
      }
      assert(e2.getMessage.contains("IDENTITY") ||
        e2.getMessage.contains("layout"), e2.getMessage)
      assert(spark.sql("SHOW TABLES IN graft").count() == 0L,
        "a refused CREATE must register nothing")
      // the corrected CREATE succeeds on the same name
      spark.sql("CREATE TABLE graft.idpart (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
      spark.sql("INSERT INTO graft.idpart (v) VALUES ('a')")
      assert(spark.sql("SELECT id FROM graft.idpart").head().getLong(0) == 1L)
    } finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }

  test("TRUNCATE TABLE: one commit, history kept, the contract survives") {
    val w = java.nio.file.Files.createTempDirectory("graft_trnc").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try {
      spark.sql("CREATE TABLE graft.trc (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, v DOUBLE)")
      spark.sql("INSERT INTO graft.trc (v) VALUES (1.0), (2.0)")
      spark.sql("TRUNCATE TABLE graft.trc")
      assert(spark.sql("SELECT count(*) FROM graft.trc").head().getLong(0) == 0L)
      // history kept: the pre-truncate snapshot still reads
      // (v1 create, v2 identity policy, v3 insert, v4 truncate)
      assert(graft.storage.TxLog.read(spark, s"$w/trc", Some(3L)).count() == 2L)
      // the identity mark survived AND never regressed
      spark.sql("INSERT INTO graft.trc (v) VALUES (7.0)")
      assert(spark.sql("SELECT id FROM graft.trc").head().getLong(0) == 3L)
    } finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }

  test("IDENTITY through plain SQL: CREATE ... GENERATED ALWAYS AS IDENTITY") {
    val w = java.nio.file.Files.createTempDirectory("graft_idsql").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try {
      spark.sql("CREATE TABLE graft.idt (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
      spark.sql("INSERT INTO graft.idt (v) VALUES ('a'), ('b')")
      spark.sql("INSERT INTO graft.idt (v) VALUES ('c')")
      val out = spark.sql("SELECT id, v FROM graft.idt ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(out.map(_._1) == Seq(1L, 2L, 3L), s"got $out")
      // GENERATED BY DEFAULT refuses loudly
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE graft.idt2 (" +
          "id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)")
      }
      assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    } finally prev match {
      case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
      case None => spark.conf.unset("graft.catalog.warehouse")
    }
  }
}
