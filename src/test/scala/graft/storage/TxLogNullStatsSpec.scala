package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Null-count skip stats (Delta's nullCount in spirit): every tracked
  * column records a per-file null count at commit time, and the batch
  * planner votes with it — `IS NULL` prunes files with ZERO nulls,
  * and the `IS NOT NULL` Spark pushes beside every comparison prunes
  * ALL-null files, which min/max alone can never prune (an all-null
  * file records no range at all). Unknown counts fail OPEN; driver
  * and distributed planning share the same vote function.
  */
class TxLogNullStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_nulls_$tag").toString + "/tbl"

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.selectedPartitions.totalNumberOfFiles).sum

  /** file A: no nulls; file B: ALL null; file C: mixed. */
  private def seed(path: String): Unit = {
    TxLog.create(Seq((1L, Some(10.0)), (2L, Some(20.0)))
      .toDF("k", "v").coalesce(1), path, statsCols = Seq("v"))
    TxLog.append(Seq((3L, Option.empty[Double]), (4L, Option.empty[Double]))
      .toDF("k", "v").coalesce(1), path)
    TxLog.append(Seq((5L, Some(50.0)), (6L, Option.empty[Double]))
      .toDF("k", "v").coalesce(1), path)
  }

  test("null counts land in the manifest per file, per tracked column") {
    val path = freshPath("collect")
    seed(path)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.files.size == 3)
    val counts = m.files.map(f => m.fileNulls.get(f).flatMap(_.get("v"))).sorted
    assert(counts == Seq(Some(0L), Some(1L), Some(2L)),
      s"expected null counts 0/1/2, got ${m.fileNulls}")
    // row totals pair with them (the all-null vote needs both)
    assert(m.files.forall(f => m.fileRows.get(f).contains(2L)))
  }

  test("IS NULL prunes zero-null files; IS NOT NULL prunes all-null files") {
    val path = freshPath("prune")
    seed(path)
    val mounted = spark.read.format("graft-txlog").option("path", path).load()
    val isNull = mounted.filter(col("v").isNull)
    assert(isNull.count() == 3)
    assert(plannedFiles(isNull) == 2,
      "the zero-null file must prune under IS NULL")
    // a comparison pushes IsNotNull alongside: the ALL-null file has no
    // min/max entry (nothing to range-vote with), yet it must prune
    val cmp = mounted.filter(col("v") > 0.0)
    assert(cmp.count() == 3)
    assert(plannedFiles(cmp) == 2,
      "the all-null file must prune under the pushed IS NOT NULL")
    // both votes compose: v IS NULL AND k-ish filters keep correctness
    val both = mounted.filter(col("v").isNotNull)
    assert(plannedFiles(both) == 2 && both.count() == 3)
  }

  test("distributed planning votes identically (checkpoint rows carry the counts)") {
    val path = freshPath("dist")
    seed(path)
    spark.conf.set("graft.txlog.distributedIndexThreshold", "1")
    try {
      val mounted = spark.read.format("graft-txlog").option("path", path).load()
      val isNull = mounted.filter(col("v").isNull)
      assert(plannedFiles(isNull) == 2 && isNull.count() == 3,
        "distributed IS NULL vote must match the driver walk")
      val cmp = mounted.filter(col("v") > 0.0)
      assert(plannedFiles(cmp) == 2 && cmp.count() == 3,
        "distributed all-null prune must match the driver walk")
    } finally spark.conf.unset("graft.txlog.distributedIndexThreshold")
  }

  test("counts survive delta replay, checkpoints and a cold cache; OPTIMIZE remeasures") {
    val path = freshPath("ckpt")
    spark.conf.set("graft.txlog.checkpointInterval", "2")
    try {
      seed(path)
      TxLog.flushSnapshotCacheForTesting()
      val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
      assert(m.fileNulls.values.flatMap(_.values).toSeq.sorted == Seq(0L, 1L, 2L),
        s"cold-cache resolution lost the counts: ${m.fileNulls}")
      TxLog.compact(spark, path)
      val mc = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
      assert(mc.fileNulls.values.flatMap(_.get("v")).sum == 3L,
        s"compacted files must remeasure their null counts: ${mc.fileNulls}")
    } finally spark.conf.unset("graft.txlog.checkpointInterval")
  }

  test("null votes follow a RENAME: the logical filter keys the physical counts") {
    val path = freshPath("renamed")
    seed(path)
    TxLog.renameColumn(spark, path, "v", "value")
    val mounted = spark.read.format("graft-txlog").option("path", path).load()
    val isNull = mounted.filter(col("value").isNull)
    assert(isNull.count() == 3)
    assert(plannedFiles(isNull) == 2,
      "IS NULL on the renamed column must still prune by the physical counts")
    val cmp = mounted.filter(col("value") > 0.0)
    assert(plannedFiles(cmp) == 2 && cmp.count() == 3,
      "the all-null file must still prune through the rename")
  }

  test("disabling stats drops the counts; untracked columns never vote") {
    val path = freshPath("off")
    seed(path)
    TxLog.setStatsCols(spark, path, Nil)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.fileNulls.isEmpty, "SET STATS COLS () must drop null counts")
    // with no tracked columns the planner fails open: all files plan
    val mounted = spark.read.format("graft-txlog").option("path", path).load()
    val q = mounted.filter(col("v").isNull)
    assert(plannedFiles(q) == 3 && q.count() == 3)
  }
}
