package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CONVERT — in-place adoption of an existing parquet directory:
  * files RENAME under `data/` (metadata ops, zero bytes rewritten),
  * v1 commits the inventory with row counts and optional skip stats,
  * and the result is a first-class table on every code path (the
  * adopted layout IS the created layout). Restartable: a partial
  * move re-adopts on the next run.
  */
class TxLogConvertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_convert_$tag").toString + "/raw"

  test("unpartitioned convert: adoption by rename, rows intact, metadata count works") {
    val dir = freshDir("plain")
    val rows = (1L to 100L).map(i => (i, s"name_$i"))
    rows.toDF("k", "name").repartition(3).write.parquet(dir)
    val v = TxLog.convert(spark, dir)
    assert(v == 1L)
    // the table reads the original rows exactly
    assert(TxLog.read(spark, dir).as[(Long, String)].collect().toSet ==
      rows.toSet)
    // row counts landed in the manifest: metadata-only count
    assert(TxLog.fastCount(spark, dir).contains(100L))
    // nothing parquet remains outside data/ (all adopted, none copied)
    val left = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(left.isEmpty, "source files must MOVE, not copy")
    // post-convert transactional writes work
    TxLog.append(Seq((101L, "new")).toDF("k", "name"), dir)
    assert(TxLog.read(spark, dir).count() == 101)
  }

  test("partitioned convert: layout preserved, pruning + rewrites work, skip stats collected") {
    val dir = freshDir("part")
    val df = (1L to 90L).map(i => (i, s"p${i % 3}", i * 1.0))
      .toDF("k", "part", "score")
    df.write.partitionBy("part").parquet(dir)
    TxLog.convert(spark, dir, partitionCols = Seq("part"),
      statsCols = Seq("k"))
    val got = TxLog.read(spark, dir)
    assert(got.count() == 90)
    assert(got.columns.toSet == Set("k", "part", "score"))
    assert(got.filter(col("part") === "p1").count() == 30)
    // skip stats collected at convert: a range read plans a file subset
    val m = TxLog.manifest(spark, dir, 1L)
    assert(m.files.forall(f => m.fileStats.get(f).exists(_.contains("k"))))
    // a partition-granular rewrite lands back in the layout
    TxLog.deleteWhere(spark, dir, col("k") % 10 === 0)
    assert(TxLog.read(spark, dir).count() == 81)
    // p0 holds multiples of 3; the delete removes k % 10 == 0, i.e.
    // k in {30, 60, 90} from it: 30 - 3 = 27
    assert(TxLog.read(spark, dir).filter(col("part") === "p0").count() == 27)
  }

  test("restartable: files already under data/ from an interrupted run re-adopt") {
    val dir = freshDir("resume")
    (1L to 40L).map(i => (i, i * 2.0)).toDF("k", "v")
      .repartition(4).write.parquet(dir)
    // simulate an interrupted convert: one file already moved
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "data"))
    assert(fs.rename(first.getPath,
      new org.apache.hadoop.fs.Path(dir + "/data", first.getPath.getName)))
    TxLog.convert(spark, dir)
    assert(TxLog.read(spark, dir).count() == 40,
      "an interrupted move's files re-adopt alongside the rest")
    assert(TxLog.manifest(spark, dir, 1L).files.size == 4)
  }

  test("distributed move path (threshold pinned low) adopts identically") {
    val dir = freshDir("dist")
    (1L to 60L).map(i => (i, s"p${i % 2}", i * 1.0)).toDF("k", "part", "score")
      .repartition(6).write.partitionBy("part").parquet(dir)
    val old = spark.conf.getOption("graft.txlog.distributedIndexThreshold")
    try {
      spark.conf.set("graft.txlog.distributedIndexThreshold", "1")
      TxLog.convert(spark, dir, partitionCols = Seq("part"))
    } finally {
      old match {
        case Some(s) => spark.conf.set("graft.txlog.distributedIndexThreshold", s)
        case None => spark.conf.unset("graft.txlog.distributedIndexThreshold")
      }
    }
    assert(TxLog.read(spark, dir).count() == 60)
    assert(TxLog.read(spark, dir).filter(col("part") === "p1").count() == 30)
    assert(TxLog.fastCount(spark, dir).contains(60L))
  }

  test("refusals: existing table, mismatched layout, empty dir") {
    val dir = freshDir("refuse")
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    intercept[IllegalArgumentException] { TxLog.convert(spark, dir) }
    val pdir = freshDir("refuse_layout")
    Seq((1L, "p1", 1.0)).toDF("k", "part", "score")
      .write.partitionBy("part").parquet(pdir)
    intercept[IllegalArgumentException] {
      TxLog.convert(spark, pdir) // partitioned source, no layout declared
    }
    intercept[IllegalArgumentException] {
      TxLog.convert(spark, freshDir("refuse_missing") + "/nope")
    }
  }

  test("SQL verb: TXLOG CONVERT with layout and stats cols") {
    val dir = freshDir("sql")
    (1L to 20L).map(i => (i, s"p${i % 2}", i * 1.0)).toDF("k", "part", "score")
      .write.partitionBy("part").parquet(dir)
    val v = graft.tools.Sql.exec(spark,
      s"TXLOG CONVERT '$dir' PARTITION BY part STATS COLS (k)")
      .collect().head.getLong(0)
    assert(v == 1L)
    assert(TxLog.read(spark, dir).count() == 20)
    assert(TxLog.manifest(spark, dir, 1L).statsCols == Seq("k"))
  }
}
