package graft.storage

import graft.SparkSpec

/** Table properties — Delta's TBLPROPERTIES shape: free-form
  * (key → value) metadata committed like any other table state (one
  * metadata version per SET/UNSET, time travel sees historical
  * values), riding the same channel CHECK constraints do so every
  * commit shape carries them. The one ENFORCED property is
  * `graft.appendOnly` (Delta's `delta.appendOnly`): these specs pin
  * the full refusal matrix — every row-removing verb refuses, every
  * content-preserving verb still flows — plus the writer-generation-5
  * protocol gate and the carry/reset semantics across TRUNCATE,
  * REPLACE, CLONE and RESTORE. */
class TxLogPropsSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_props_$tag"
    val f = new java.io.File(d)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)
    d
  }

  private def seed(path: String): Unit = {
    import spark.implicits._
    TxLog.create(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "amt", "part"),
      path, Some("part"))
  }

  test("SET/UNSET round trip: one commit each, re-set overwrites, time travel sees old values") {
    val path = freshDir("roundtrip")
    seed(path)
    assert(TxLog.propertiesOf(spark, path) == Map.empty)
    val v2 = TxLog.setProperties(spark, path,
      Map("owner.team" -> "ingest", "retention-days" -> "30"))
    assert(v2 == 2L, "SET TBLPROPERTIES is one metadata commit")
    assert(TxLog.propertiesOf(spark, path) ==
      Map("owner.team" -> "ingest", "retention-days" -> "30"))
    val v3 = TxLog.setProperties(spark, path, Map("retention-days" -> "90"))
    assert(v3 == 3L)
    assert(TxLog.propertiesOf(spark, path)("retention-days") == "90",
      "re-setting a present key overwrites its value")
    assert(TxLog.propertiesOf(spark, path, Some(2L))("retention-days") == "30",
      "historical versions keep their own property values")
    val v4 = TxLog.unsetProperties(spark, path, Seq("owner.team"))
    assert(v4 == 4L)
    assert(TxLog.propertiesOf(spark, path) == Map("retention-days" -> "90"))
    // idempotent: unsetting an absent key writes NO commit
    assert(TxLog.unsetProperties(spark, path, Seq("owner.team")) == 4L,
      "unset of an absent key is a no-op, not a new version")
    assert(TxLog.currentVersion(spark, path).contains(4L))
  }

  test("key validation: reserved __ prefix, bad charset, bad appendOnly value all refuse") {
    val path = freshDir("validate")
    seed(path)
    intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map("__sneaky" -> "x"))
    }
    intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map("has space" -> "x"))
    }
    intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "yes"))
    }
    assert(TxLog.currentVersion(spark, path).contains(1L),
      "every refusal happens before any commit")
  }

  test("properties never bind as CHECKs and survive appends, OPTIMIZE and schema DDL") {
    import spark.implicits._
    val path = freshDir("carry")
    seed(path)
    // a value that is NOT valid SQL must never reach the CHECK binder
    TxLog.setProperties(spark, path, Map("pipeline" -> "nightly :: v2 (!)"))
    TxLog.append(Seq((3L, 30.0, "a")).toDF("k", "amt", "part"), path)
    TxLog.compact(spark, path)
    TxLog.addColumn(spark, path, "note", "STRING")
    assert(TxLog.propertiesOf(spark, path) ==
      Map("pipeline" -> "nightly :: v2 (!)"),
      "every commit shape carries the property channel forward")
    assert(TxLog.read(spark, path).count() == 3L)
    // the constraint surfaces stay clean: detail counts no phantom
    // CHECK, and the constraints listing shows none
    val det = TxLog.detail(spark, path)
      .select("n_check_constraints", "properties").collect().head
    assert(det.getInt(0) == 0,
      s"properties are not CHECK constraints (got ${det.getInt(0)})")
    assert(det.getAs[Map[String, String]]("properties") ==
      Map("pipeline" -> "nightly :: v2 (!)"),
      "DESCRIBE DETAIL surfaces the property set")
  }

  test("properties carry through CLONE and reset on REPLACE (redefinition)") {
    import spark.implicits._
    val src = freshDir("clone_src")
    val dst = freshDir("clone_dst")
    seed(src)
    TxLog.setProperties(spark, src, Map("tier" -> "gold"))
    TxLog.clone(spark, src, dst)
    assert(TxLog.propertiesOf(spark, dst) == Map("tier" -> "gold"),
      "a clone is a full table copy — properties included")
    // redefinition resets the whole governance contract, properties too
    TxLog.createOrReplace(Seq((9L, 1.0, "z")).toDF("k", "amt", "part"), src,
      Some("part"))
    assert(TxLog.propertiesOf(spark, src) == Map.empty,
      "CREATE OR REPLACE (redefinition) resets properties like constraints")
    assert(TxLog.propertiesOf(spark, src, Some(2L)) == Map("tier" -> "gold"),
      "history keeps the old contract")
  }

  test("appendOnly=true: the full refusal matrix, and UNSET re-opens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val path = freshDir("appendonly")
    seed(path)
    TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "true"))
    val vLocked = TxLog.currentVersion(spark, path).get

    def refused(op: => Any): String = {
      val e = intercept[UnsupportedOperationException](op)
      assert(e.getMessage.contains(TxLog.AppendOnlyProp),
        s"refusal must name the property: ${e.getMessage}")
      e.getMessage
    }
    refused(TxLog.deleteWhere(spark, path, col("k") === 1L))
    refused(TxLog.deleteWhere(spark, path, col("k") === 1L,
      deletionVectors = true))
    refused(TxLog.updateWhere(spark, path, Seq("amt" -> "amt + 1"),
      col("k") === 1L))
    refused(TxLog.mergeInto(path,
      Seq((1L, 11.0, "a")).toDF("k", "amt", "part"), Seq("k")))
    refused(TxLog.mergeWhen(path,
      Seq((1L, 11.0, "a")).toDF("k", "amt", "part"), Seq("k"),
      matched = Seq(TxLog.MergeClause(None, "update",
        Seq("amt" -> "s.amt")))))
    refused(TxLog.replacePartitions(
      Seq((1L, 11.0, "a")).toDF("k", "amt", "part"), path, Seq("a")))
    refused(TxLog.restore(spark, path, 1L))
    refused(TxLog.applyChanges(path,
      Seq((1L, 11.0, "a", "update")).toDF("k", "amt", "part", "_change_type"),
      Seq("k")))
    refused(TxLog.createOrReplace(
      Seq((9L, 1.0, "z")).toDF("k", "amt", "part"), path,
      keepPolicies = true))
    // the format door's data-writer overwrite is NOT the DDL escape
    // hatch — it refuses like every other row-removing door
    refused(Seq((9L, 1.0, "z")).toDF("k", "amt", "part").write
      .format("graft-txlog").mode("overwrite").option("path", path).save())
    assert(TxLog.currentVersion(spark, path).contains(vLocked),
      "every refusal leaves the version untouched")

    // content-preserving and append verbs still flow
    assert(TxLog.append(Seq((3L, 30.0, "a")).toDF("k", "amt", "part"), path)
      == vLocked + 1)
    val vMerged = TxLog.mergeWhen(path,
      Seq((4L, 40.0, "b")).toDF("k", "amt", "part"), Seq("k"),
      notMatched = Seq(TxLog.MergeClause(None, "insert")))
    assert(vMerged == vLocked + 2, "an INSERT-only merge is an append")
    TxLog.compact(spark, path)
    assert(TxLog.read(spark, path).count() == 4L,
      "OPTIMIZE preserves content and stays open under appendOnly")

    // the switch is reversible — governance, not a ratchet on data
    TxLog.unsetProperties(spark, path, Seq(TxLog.AppendOnlyProp))
    TxLog.deleteWhere(spark, path, col("k") === lit(3L))
    assert(TxLog.read(spark, path).count() == 3L,
      "after UNSET the delete flows again")
  }

  test("OCC: a rewrite staged under the old property set conflicts with a racing SET TBLPROPERTIES") {
    import spark.implicits._
    val path = freshDir("occ_props")
    seed(path)
    val base = TxLog.manifest(spark, path, 1L)
    // the race: appendOnly lands AFTER the delete staged its plan
    // against v1 — the delete must RECOMPUTE, not re-point (landing it
    // would remove rows the new contract just protected)
    TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "true"))
    val e = intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path, base,
        rewriteDirs = Set("part=a"), newFiles = Nil,
        schemaDdl = base.schemaDdl, batchId = None, readSet = None,
        operation = "DELETE (race test)")
    }
    assert(e.getMessage.contains("constraint change"), e.getMessage)
    assert(TxLog.read(spark, path).count() == 2,
      "the stale rewrite must not land")
    // same shape for a FREE-FORM property: the channel comparison is
    // equality, so any concurrent SET conflicts a concurrent rewrite
    val path2 = freshDir("occ_props_free")
    seed(path2)
    val base2 = TxLog.manifest(spark, path2, 1L)
    TxLog.setProperties(spark, path2, Map("tier" -> "gold"))
    intercept[TxLog.CommitConflictException] {
      TxLog.commitRebase(spark, path2, base2,
        rewriteDirs = Set("part=a"), newFiles = Nil,
        schemaDdl = base2.schemaDdl, batchId = None, readSet = None,
        operation = "DELETE (race test)")
    }
  }

  test("appendOnly=true raises the writer gate to generation 5 in the commit metadata") {
    val path = freshDir("minwriter")
    seed(path)
    TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "true"))
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_manifests/v2.json")), "UTF-8")
    assert(json.contains("\"minWriter\" : 5") || json.contains("\"minWriter\":5"),
      s"enforced property must gate older writers (generation 5): $json")
    // a free-form property never raises the gate
    val path2 = freshDir("minwriter_free")
    seed(path2)
    TxLog.setProperties(spark, path2, Map("tier" -> "gold"))
    val json2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path2/_manifests/v2.json")), "UTF-8")
    assert(!json2.contains("minWriter"),
      s"free-form properties carry on any writer generation: $json2")
  }

  test("graft.optimizedWrite as a TABLE property overrides the session conf both ways") {
    import spark.implicits._
    def dataFiles(path: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$path/data"))
    }
    val batch = (0 until 64).map(i => (i.toLong, i * 1.0, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "amt", "part").repartition(8)
    val prev = spark.conf.getOption("graft.txlog.optimizedWrite")
    try {
      // session OFF, table property ON → one file per partition dir
      spark.conf.unset("graft.txlog.optimizedWrite")
      val on = freshDir("optw_on")
      seed(on)
      TxLog.setProperties(spark, on, Map(TxLog.OptimizedWriteProp -> "true"))
      val before = dataFiles(on)
      TxLog.append(batch, on)
      assert(dataFiles(on) - before == 2,
        s"optimizedWrite table property must land ~one file per dir, " +
          s"got ${dataFiles(on) - before}")
      // session ON, table property FALSE → the table's word wins
      spark.conf.set("graft.txlog.optimizedWrite", "true")
      val off = freshDir("optw_off")
      seed(off)
      TxLog.setProperties(spark, off, Map(TxLog.OptimizedWriteProp -> "false"))
      val before2 = dataFiles(off)
      TxLog.append(batch, off)
      assert(dataFiles(off) - before2 > 2,
        "table property false must override the session's optimizedWrite")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.txlog.optimizedWrite", v)
      case None => spark.conf.unset("graft.txlog.optimizedWrite")
    }
  }

  test("a property VALUE mentioning a column name never blocks RENAME/DROP COLUMN") {
    import spark.implicits._
    val path = freshDir("propword")
    seed(path)
    TxLog.addColumn(spark, path, "note", "STRING")
    // the value names both columns — opaque text, not SQL
    TxLog.setProperties(spark, path,
      Map("pipeline.doc" -> "refresh amt and note nightly"))
    TxLog.renameColumn(spark, path, "amt", "amount")
    TxLog.dropColumn(spark, path, "note")
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "amount", "part"))
    assert(TxLog.propertiesOf(spark, path)("pipeline.doc") ==
      "refresh amt and note nightly", "the property text rides unchanged")
    // a REAL CHECK referencing the column still blocks, prop present
    TxLog.addConstraint(spark, path, "amount_pos", "amount > 0")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "amount", "amt2")
    }
  }

  test("graft.zorderCols: bare OPTIMIZE uses the declared clustering; explicit wins; stale declaration refuses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = freshDir("zorder_prop")
    TxLog.create((0 until 64).map(i => (i.toLong, i * 1.0, "a"))
      .toDF("k", "amt", "part").repartition(8), path, Some("part"))
    // validation: the declared columns must exist at SET time
    intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map(TxLog.ZorderColsProp -> "nope"))
    }
    TxLog.setProperties(spark, path, Map(TxLog.ZorderColsProp -> "k"))
    TxLog.compact(spark, path)
    def ops() = TxLog.history(spark, path)
      .select("operation").as[String].collect().toSeq
    assert(ops().contains("OPTIMIZE ZORDER BY k"),
      s"bare OPTIMIZE must lay out by the declared clustering: ${ops()}")
    // an explicit zorderBy wins over the declaration
    TxLog.append((64 until 128).map(i => (i.toLong, i * 1.0, "a"))
      .toDF("k", "amt", "part").repartition(4), path)
    TxLog.compact(spark, path, zorderBy = Seq("amt"))
    assert(ops().contains("OPTIMIZE ZORDER BY amt"), ops().toString)
    // a later DROP COLUMN leaves the declaration stale: OPTIMIZE
    // refuses loudly instead of silently skipping the layout
    TxLog.dropColumn(spark, path, "k")
    val e = intercept[IllegalArgumentException] {
      TxLog.compact(spark, path, minFilesToCompact = 1)
    }
    assert(e.getMessage.contains(TxLog.ZorderColsProp) ||
      e.getMessage.contains("z-order column"), e.getMessage)
    // re-declaring heals it
    TxLog.setProperties(spark, path, Map(TxLog.ZorderColsProp -> "amt"))
    TxLog.compact(spark, path, minFilesToCompact = 1)
    assert(TxLog.read(spark, path).count() == 128)
  }

  test("graft.retentionHours: vacuum without keepHours honors the declared retention; explicit wins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = freshDir("retention")
    TxLog.create(Seq((1L, 1.0, "a"), (2L, 2.0, "a"))
      .toDF("k", "amt", "part"), path, Some("part"))            // v1
    TxLog.deleteWhere(spark, path, col("k") === 1L)             // v2 strands v1's file
    TxLog.append(Seq((3L, 3.0, "a")).toDF("k", "amt", "part"), path) // v3
    intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map(TxLog.RetentionHoursProp -> "soon"))
    }
    TxLog.setProperties(spark, path, Map(TxLog.RetentionHoursProp -> "24"))
    // bare vacuum: the DECLARED 24h window keeps everything recent
    val kept = TxLog.vacuum(spark, path, keepVersions = 1)
    assert(kept.isEmpty,
      s"declared retention must keep seconds-old versions: $kept")
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, path, Some(1L)).count() == 2,
      "v1 stays time-travelable under the declared window")
    // an explicit keepHours always wins over the declaration
    TxLog.vacuum(spark, path, keepVersions = 1, keepHours = Some(0.0))
    TxLog.flushSnapshotCacheForTesting()
    intercept[Exception] { TxLog.read(spark, path, Some(1L)).count() }
    assert(TxLog.read(spark, path).count() == 2)
  }

  test("appendOnly=false is a no-op value and does not raise the writer gate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = freshDir("explicit_false")
    seed(path)
    TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "false"))
    TxLog.deleteWhere(spark, path, col("k") === 1L)
    assert(TxLog.read(spark, path).count() == 1L,
      "appendOnly=false leaves every verb open")
  }

  test("declared Bloom columns: every data commit auto-extends the sidecar index") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = freshDir("bloomdecl")
    // interleaved ids so min/max stats cannot prune a point lookup —
    // only Bloom sidecars can (the TxLogSpec bloom fixture shape)
    val ids = (0L until 512L).map(i => java.lang.Long.reverse(i) >>> 55)
    val df = ids.zipWithIndex.map { case (id, i) => (id, s"doc$id", i % 8) }
      .toDF("id", "body", "bucket")
      .repartitionByRange(8, col("bucket")).drop("bucket")
    TxLog.create(df, path, statsCols = Seq("id"))
    // SET backfills the existing files right away
    TxLog.setProperties(spark, path, Map(TxLog.BloomColsProp -> "id"))
    val m1 = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get)
    val planned = TxLog.prunedFilesByKey(spark, path, "id", 137L)
    assert(planned.size < m1.files.size,
      s"declared backfill pruned nothing: ${planned.size} of ${m1.files.size}")
    // an APPEND maintains the index with no manual build call: the
    // point read plans at most pre-append admitted + the one new file
    val preAdmitted = TxLog.prunedFilesByKey(spark, path, "id", 100000L).size
    TxLog.append(Seq((100000L, "new")).toDF("id", "body"), path)
    val postAdmitted = TxLog.prunedFilesByKey(spark, path, "id", 100000L)
    assert(postAdmitted.size <= preAdmitted + 1,
      s"append left unindexed files: ${postAdmitted.size} vs pre $preAdmitted + 1")
    val got = TxLog.readByKey(spark, path, "id", 100000L)
      .select("id", "body").as[(Long, String)].collect().toSeq
    assert(got == Seq((100000L, "new")))
    // a column not in the schema refuses at SET time
    val e = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map(TxLog.BloomColsProp -> "nope"))
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("auto-compact: tiny appends heal as a follow-on OPTIMIZE; history and time travel intact") {
    import spark.implicits._
    val path = freshDir("autocompact")
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), path, Some("part"))
    TxLog.setProperties(spark, path, Map(TxLog.AutoCompactProp -> "true"))
    spark.conf.set("graft.txlog.autoCompactMinFiles", "4")
    try {
      (1L to 6L).foreach(i =>
        TxLog.append(Seq((i, "p0", i.toDouble)).toDF("k", "part", "v"), path))
      val m = TxLog.manifest(spark, path,
        TxLog.currentVersion(spark, path).get)
      assert(m.files.size < 5,
        s"auto-compact did not bound the file count: ${m.files.size} files")
      assert(TxLog.read(spark, path).count() == 7L,
        "the heal must preserve every row")
      val ops = TxLog.history(spark, path).select("operation")
        .as[String].collect().toSeq
      assert(ops.exists(_.startsWith("OPTIMIZE")) &&
        ops.exists(_.startsWith("APPEND")),
        s"history must show the APPEND...OPTIMIZE sequence, got $ops")
      // time travel to a pre-compact version still serves (files kept)
      assert(TxLog.read(spark, path, Some(3L)).count() > 0)
    } finally spark.conf.unset("graft.txlog.autoCompactMinFiles")
  }

  test("auto-compact and appendOnly refuse to combine, in either order") {
    import spark.implicits._
    val path = freshDir("acao")
    seed(path)
    TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "true"))
    val e1 = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map(TxLog.AutoCompactProp -> "true"))
    }
    assert(e1.getMessage.contains("cannot combine"), e1.getMessage)
    TxLog.unsetProperties(spark, path, Seq(TxLog.AppendOnlyProp))
    TxLog.setProperties(spark, path, Map(TxLog.AutoCompactProp -> "true"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "true"))
    }
    assert(e2.getMessage.contains("cannot combine"), e2.getMessage)
    // one statement declaring both refuses the same way
    val path2 = freshDir("acao2")
    seed(path2)
    val e3 = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, path2, Map(
        TxLog.AppendOnlyProp -> "true", TxLog.AutoCompactProp -> "true"))
    }
    assert(e3.getMessage.contains("cannot combine"), e3.getMessage)
  }

  test("graft.deletionVectors: DELETE/UPDATE on a declared table default to merge-on-read") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = freshDir("dvdecl")
    seed(path)
    TxLog.setProperties(spark, path, Map(TxLog.DeletionVectorsProp -> "true"))
    val preFiles = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).files.toSet
    // no per-call flag anywhere — the table's word turns DV mode on
    TxLog.deleteWhere(spark, path, col("k") === 1L)
    val m1 = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m1.dv.nonEmpty, "declared table must delete via deletion vectors")
    assert(m1.files.toSet == preFiles,
      "a DV delete must not rewrite any data file")
    assert(TxLog.read(spark, path).filter(col("k") === 1L).count() == 0)
    TxLog.updateWhere(spark, path, Seq("amt" -> "amt + 1"), col("k") === 2L)
    val m2 = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m2.dv.nonEmpty, "declared table must update via deletion vectors")
    assert(TxLog.read(spark, path).filter(col("k") === 2L)
      .select("amt").as[Double].head() == 21.0)
    // the MERGE family rides the declaration too (Delta's
    // enableDeletionVectors contract): a flagless matched-key merge
    // goes merge-on-read — no data file leaves the manifest
    val preMerge = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).files.toSet
    TxLog.mergeInto(path, Seq((2L, 99.0, "b")).toDF("k", "amt", "part"),
      Seq("k"))
    val mM = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(preMerge.subsetOf(mM.files.toSet),
      "a declared-table merge must not rewrite existing files")
    assert(TxLog.read(spark, path).filter(col("k") === 2L)
      .select("amt").as[Double].head() == 99.0)
    // compaction stays the materialization path
    TxLog.compact(spark, path, minFilesToCompact = 1)
    val m3 = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m3.dv.isEmpty, "OPTIMIZE must materialize the deletion vectors")
    assert(TxLog.read(spark, path).count() == 1L)
  }

  test("a Txn defers the auto-compact heal; the next ordinary commit heals") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = freshDir("txnac")
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), path, Some("part"))
    TxLog.setProperties(spark, path, Map(TxLog.AutoCompactProp -> "true"))
    spark.conf.set("graft.txlog.autoCompactMinFiles", "2")
    try {
      // three appends as ONE transaction: no heal may land between the
      // ops (it would strand compensation), so no OPTIMIZE in history
      Txn.transact(spark, path, (1L to 3L).map(i =>
        Txn.Append(path, Seq((i, "p0", i.toDouble)).toDF("k", "part", "v"))))
      val opsAfterTxn = TxLog.history(spark, path).select("operation")
        .as[String].collect().toSeq
      assert(!opsAfterTxn.exists(_.startsWith("OPTIMIZE")),
        s"a heal landed inside the transaction: $opsAfterTxn")
      // the next ORDINARY commit heals the declared table
      TxLog.append(Seq((9L, "p0", 9.0)).toDF("k", "part", "v"), path)
      val ops = TxLog.history(spark, path).select("operation")
        .as[String].collect().toSeq
      assert(ops.exists(_.startsWith("OPTIMIZE")),
        s"the deferred heal never ran: $ops")
      assert(TxLog.read(spark, path).count() == 5L)
    } finally spark.conf.unset("graft.txlog.autoCompactMinFiles")
  }
}
