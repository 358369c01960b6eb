package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The FILES metadata table: per-file inventory from manifest
  * metadata only. The small-table path converts the resolved manifest
  * directly; the scale path serves the same rows from the columnar
  * checkpoint (plus task-statted size/mtime) — parity is pinned by
  * running both on one table. Stats keys surface under LOGICAL names
  * across renames, and a dropped column's lingering entries filter
  * out.
  */
class TxLogFilesSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_files_$tag").toString + "/tbl"

  test("files(): one row per live file with partition dir, rows, stats, DV counts") {
    val path = freshPath("basic")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "part", "score"), path, Some("part"),
      statsCols = Seq("k"))
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    val inv = TxLog.files(spark, path).collect()
    assert(inv.map(_.getAs[String]("file")).toSet == m.files.toSet)
    // partition dirs parse from the entry paths
    assert(inv.map(_.getAs[String]("partition_dir")).toSet ==
      Set("part=p1", "part=p2"))
    // metadata row counts sum to the table count without reading data
    assert(inv.map(_.getAs[Long]("rows")).sum == 3L)
    // skip stats ride along per file — range entries AND null counts
    assert(inv.forall(r =>
      r.getAs[Map[String, Seq[String]]]("stats").contains("k")))
    assert(inv.forall(r =>
      r.getAs[Map[String, Long]]("null_counts").get("k").contains(0L)),
      "tracked columns surface their per-file null counts")
    assert(inv.forall(_.getAs[Long]("dv_deleted_rows") == 0L))
    // a DV delete surfaces per-file outstanding counts
    TxLog.deleteWhere(spark, path, col("k") === 1L, deletionVectors = true)
    val afterDv = TxLog.files(spark, path).collect()
    assert(afterDv.map(_.getAs[Long]("dv_deleted_rows")).sum == 1L)
    // version pinning: the pre-delete snapshot still reports zero
    assert(TxLog.files(spark, path, Some(1L)).collect()
      .map(_.getAs[Long]("dv_deleted_rows")).sum == 0L)
  }

  test("checkpoint-served path matches the driver path row-for-row (plus size/mtime)") {
    val path = freshPath("parity")
    TxLog.create((1L to 50L).map(i => (i, s"p${i % 3}", i * 1.0))
      .toDF("k", "part", "score"), path, Some("part"), statsCols = Seq("k"))
    TxLog.deleteWhere(spark, path, col("k") % 7 === 0, deletionVectors = true)
    val driverSide = TxLog.files(spark, path)
      .select("file", "partition_dir", "rows", "dv_deleted_rows", "stats")
      .orderBy("file").collect().toSeq
    val old = spark.conf.getOption("graft.txlog.distributedIndexThreshold")
    try {
      spark.conf.set("graft.txlog.distributedIndexThreshold", "1")
      val ckptSide = TxLog.files(spark, path)
      assert(ckptSide.select("file", "partition_dir", "rows",
        "dv_deleted_rows", "stats").orderBy("file").collect().toSeq == driverSide,
        "checkpoint-served inventory must equal the driver-side one")
      // the scale path also carries task-statted sizes
      assert(ckptSide.filter(col("size_bytes").isNull).count() == 0,
        "checkpoint path stats file sizes in tasks")
    } finally {
      old match {
        case Some(s) => spark.conf.set("graft.txlog.distributedIndexThreshold", s)
        case None => spark.conf.unset("graft.txlog.distributedIndexThreshold")
      }
    }
  }

  test("stats keys translate across renames; dropped columns' entries filter out") {
    val path = freshPath("logical")
    TxLog.create(Seq((1L, 1.0, "x"), (9L, 2.0, "y")).toDF("k", "score", "tag"),
      path, statsCols = Seq("k", "score"))
    TxLog.renameColumn(spark, path, "k", "id")
    val inv = TxLog.files(spark, path).collect()
    assert(inv.forall { r =>
      val s = r.getAs[Map[String, Seq[String]]]("stats")
      s.contains("id") && !s.contains("k") && s.contains("score")
    }, "renamed stats key must surface under the LOGICAL name")
    assert(inv.forall { r =>
      val nn = r.getAs[Map[String, Long]]("null_counts")
      nn.contains("id") && !nn.contains("k")
    }, "null counts translate across renames too")
    TxLog.dropColumn(spark, path, "score")
    val afterDrop = TxLog.files(spark, path).collect()
    assert(afterDrop.forall { r =>
      val s = r.getAs[Map[String, Seq[String]]]("stats")
      s.contains("id") && !s.contains("score")
    }, "a dropped column's stats entries are not a column")
  }

  test("partitions(): per-partition aggregates match the file inventory, DV rows included") {
    val path = freshPath("parts")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0),
      (4L, "p2", 4.0), (5L, "p2", 5.0))
      .toDF("k", "part", "score"), path, Some("part"))
    TxLog.append(Seq((6L, "p1", 6.0)).toDF("k", "part", "score"), path)
    TxLog.deleteWhere(spark, path, col("k") === 3L, deletionVectors = true)
    val parts = TxLog.partitions(spark, path).collect()
      .map(r => r.getAs[String]("partition_dir") ->
        (r.getAs[Long]("num_files"), r.getAs[Long]("rows"),
          r.getAs[Long]("dv_deleted_rows"))).toMap
    assert(parts.keySet == Set("part=p1", "part=p2"), parts.toString)
    assert(parts("part=p1")._2 == 3L && parts("part=p2")._2 == 3L,
      s"metadata row counts per partition: $parts")
    assert(parts("part=p2")._3 == 1L && parts("part=p1")._3 == 0L,
      s"outstanding DV deletes attribute to their partition: $parts")
    // version pinning: the pre-delete snapshot shows no DV rows
    val v2 = TxLog.partitions(spark, path, Some(2L)).collect()
      .map(r => r.getAs[String]("partition_dir") ->
        r.getAs[Long]("dv_deleted_rows")).toMap
    assert(v2.values.forall(_ == 0L), v2.toString)
    // the TVF window
    val tvf = spark.sql(
      s"SELECT partition_dir, rows FROM graft_txlog_partitions('$path')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tvf == Map("part=p1" -> 3L, "part=p2" -> 3L), tvf.toString)
  }

  test("SQL surface: graft_txlog_files TVF serves the same inventory") {
    val path = freshPath("tvf")
    TxLog.create(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val viaSql = spark.sql(
      s"SELECT file, rows FROM graft_txlog_files('$path') ORDER BY file")
      .collect().toSeq
    val viaApi = TxLog.files(spark, path)
      .select("file", "rows").orderBy("file").collect().toSeq
    assert(viaSql == viaApi)
  }
}
