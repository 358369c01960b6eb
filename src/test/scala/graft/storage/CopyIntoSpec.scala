package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COPY INTO — the idempotent file-loading verb: only never-seen
  * source files load, re-runs are no-ops, a rewritten file (changed
  * size/mtime identity) re-presents as new, and the data + ledger
  * appends land as ONE journaled transaction. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_copy_$tag").toString

  private def writeSrcFile(dir: String, name: String,
                           rows: Seq[(Long, Double)]): Unit = {
    val tmp = fresh("stage")
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val part = new java.io.File(tmp).listFiles
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(part.getPath),
      new org.apache.hadoop.fs.Path(dir, name))
  }

  test("COPY INTO loads each source file exactly once; re-runs are no-ops") {
    val table = fresh("tbl") + "/t"
    val src = fresh("src")
    TxLog.create(Seq((0L, 0.0)).toDF("k", "v"), table)
    writeSrcFile(src, "a.parquet", Seq((1L, 1.0), (2L, 2.0)))
    writeSrcFile(src, "b.parquet", Seq((3L, 3.0)))
    val (n1, v1) = CopyInto.copyInto(spark, table, src)
    assert(n1 == 2, s"first copy loaded $n1 files")
    assert(TxLog.read(spark, table).count() == 4L)
    // idempotent: nothing new, no commit
    val (n2, v2) = CopyInto.copyInto(spark, table, src)
    assert(n2 == 0 && v2 == TxLog.currentVersion(spark, table).get,
      s"re-run loaded $n2 files")
    assert(TxLog.read(spark, table).count() == 4L,
      "a re-run must not double-load")
    // a NEW file loads alone
    writeSrcFile(src, "c.parquet", Seq((4L, 4.0)))
    val (n3, _) = CopyInto.copyInto(spark, table, src)
    assert(n3 == 1, s"incremental copy loaded $n3 files")
    assert(TxLog.read(spark, table).select("k").as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 3L, 4L))
    // a REWRITTEN file (same name, new size/mtime identity) re-presents
    writeSrcFile(src, "b.parquet", Seq((30L, 30.0), (31L, 31.0)))
    val (n4, _) = CopyInto.copyInto(spark, table, src)
    assert(n4 == 1, s"rewritten file loaded $n4 files")
    assert(TxLog.read(spark, table).select("k").as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 3L, 4L, 30L, 31L),
      "the rewritten file's NEW content loads (the old rows stay — " +
        "COPY INTO appends, it does not reconcile)")
    // loading an absent table refuses with nothing staged
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, fresh("nope") + "/missing", src)
    }
    assert(e.getMessage.contains("EXISTING"), e.getMessage)
  }

  test("TXLOG COPY INTO verb: SQL spelling, schema vetting, ledger is transactional") {
    val table = fresh("sqltbl") + "/t"
    val src = fresh("sqlsrc")
    TxLog.create(Seq((0L, 0.0)).toDF("k", "v"), table)
    TxLog.addConstraint(spark, table, "v_pos", "v >= 0")
    writeSrcFile(src, "a.parquet", Seq((1L, 1.0)))
    val out = graft.tools.Sql.exec(spark,
      s"TXLOG COPY INTO '$table' FROM '$src'").head()
    assert(out.getLong(0) == 1L, s"verb loaded ${out.getLong(0)} files")
    assert(TxLog.read(spark, table).count() == 2L)
    // a file violating the table's CHECK refuses — and the LEDGER does
    // not record it (the journaled txn compensates), so a later fixed
    // run still sees the file as unloaded
    writeSrcFile(src, "bad.parquet", Seq((9L, -9.0)))
    intercept[Exception] {
      graft.tools.Sql.exec(spark, s"TXLOG COPY INTO '$table' FROM '$src'")
    }
    assert(TxLog.read(spark, table).count() == 2L,
      "a refused copy must land nothing")
    assert(TxLog.read(spark, s"$table/_copy_into")
      .filter(col("file").contains("bad")).count() == 0,
      "the ledger must not record a compensated load")
    // fix the file: the SAME run now loads it (identity changed)
    writeSrcFile(src, "bad.parquet", Seq((9L, 9.0)))
    val (n, _) = CopyInto.copyInto(spark, table, src)
    assert(n == 1)
    assert(TxLog.read(spark, table).filter(col("k") === 9L).count() == 1)
  }

  test("CALL graft.system.copy_into: the catalog-native spelling") {
    val wh = fresh("wh")
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", wh)
    try {
      spark.sql("CREATE TABLE graft.landing (k BIGINT, v DOUBLE)")
      val src = fresh("procsrc")
      writeSrcFile(src, "a.parquet", Seq((1L, 1.0), (2L, 2.0)))
      val row = spark.sql("CALL graft.system.copy_into(" +
        s"table => 'landing', source_dir => '$src')").head()
      assert(row.getLong(0) == 1L, s"loaded ${row.getLong(0)} files")
      assert(spark.sql("SELECT count(*) FROM graft.landing")
        .head().getLong(0) == 2L)
      // idempotent through the procedure door too
      assert(spark.sql("CALL graft.system.copy_into(" +
        s"table => 'landing', source_dir => '$src')").head().getLong(0) == 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.landing")
      prev match {
        case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
        case None => spark.conf.unset("graft.catalog.warehouse")
      }
    }
  }
}
