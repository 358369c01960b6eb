package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RENAME COLUMN via column mapping — a metadata commit, zero file
  * rewrites: new reads see the new name, version-pinned reads keep
  * their own names, CDF across the rename matches rows by PHYSICAL
  * identity (zero spurious updates), writes translate, and the
  * skip-index / Bloom / UNIQUE machinery keys by physical name so it
  * survives the rename untouched.
  */
class TxLogRenameSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rename_$tag").toString + "/tbl"

  test("rename is metadata-only: no file moves, new name reads, old versions keep old names") {
    val path = freshPath("meta")
    val d = Seq((1L, "p1", 1.0), (2L, "p2", 2.0)).toDF("k", "part", "score")
    TxLog.create(d, path, Some("part"))
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    val v = TxLog.renameColumn(spark, path, "score", "quality")
    assert(v == 2L)
    // zero data movement
    assert(TxLog.manifest(spark, path, 2L).files.toSet == filesBefore)
    // head reads the NEW name, values intact
    val head = TxLog.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "part", "quality"))
    assert(head.select("k", "quality").as[(Long, Double)].collect().toSet ==
      Set((1L, 1.0), (2L, 2.0)))
    // the pinned OLD version keeps its own name
    val v1 = TxLog.read(spark, path, Some(1L))
    assert(v1.columns.toSeq == Seq("k", "part", "score"))
    // appends under the new name land and read back
    TxLog.append(Seq((3L, "p1", 3.0)).toDF("k", "part", "quality"), path)
    assert(TxLog.read(spark, path).filter(col("k") === 3L)
      .select("quality").as[Double].head() == 3.0)
    // double rename chains through the same physical anchor
    TxLog.renameColumn(spark, path, "quality", "score2")
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "part", "score2"))
    assert(TxLog.read(spark, path).select(sum("score2")).head().getDouble(0) == 6.0)
    // renaming back to the original physical name drops the mapping
    TxLog.renameColumn(spark, path, "score2", "score")
    assert(TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).colMap.isEmpty)
    assert(TxLog.read(spark, path).select(sum("score")).head().getDouble(0) == 6.0)
  }

  test("CDF across a rename: zero spurious updates; real changes still surface under the new name") {
    val path = freshPath("cdf")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "part", "score"), path, Some("part"))
    TxLog.renameColumn(spark, path, "score", "quality")         // v2
    // rename alone: NOTHING changed row-wise
    assert(TxLog.changes(spark, path, 1L, 2L, Seq("k")).count() == 0,
      "a pure rename must produce an empty change feed")
    // now a real change after the rename
    TxLog.mergeInto(path,
      Seq((2L, "p1", 99.0), (4L, "p2", 4.0)).toDF("k", "part", "quality"),
      Seq("k"))                                                  // v3
    val feed = TxLog.changes(spark, path, 1L, 3L, Seq("k"))
    assert(feed.columns.contains("quality"), feed.columns.mkString(","))
    val byKey = feed.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("_change_type")).toMap
    assert(byKey == Map(2L -> "update", 4L -> "insert"), byKey.toString)
  }

  test("rename of a partition column and a stats column: pruning and merge still work") {
    val path = freshPath("layout")
    TxLog.create(spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 4).cast("string").as("part"), lit(1.0).as("v")).coalesce(2),
      path, Some("part"), statsCols = Seq("k"))
    TxLog.renameColumn(spark, path, "part", "bucket")
    TxLog.renameColumn(spark, path, "k", "key_id")
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.partitionCols == Seq("bucket"))
    // stats stay keyed physical; pruning through the LOGICAL name works
    val pruned = TxLog.prunedFiles(spark, path, "key_id", 0L, 1L)
    assert(pruned.size < m.files.size || m.files.size == 1,
      s"stats pruning broke across rename: ${pruned.size}/${m.files.size}")
    assert(TxLog.readBetween(spark, path, "key_id", 10L, 12L).count() == 3)
    // merge under the renamed names: file-granular machinery intact
    TxLog.mergeInto(path,
      Seq((5L, "1", -5.0)).toDF("key_id", "bucket", "v"), Seq("key_id"))
    assert(TxLog.read(spark, path).filter(col("key_id") === 5L)
      .select("v").as[Double].head() == -5.0)
    // deleteWhere under the new name
    TxLog.deleteWhere(spark, path, col("key_id") === 7L)
    assert(TxLog.read(spark, path).filter(col("key_id") === 7L).count() == 0)
  }

  test("declared zorderCols/bloomCols follow a rename like uniques do") {
    val path = freshPath("declrename")
    TxLog.create(spark.range(0, 20).select(col("id").as("k"),
      lit(1.0).as("v")).coalesce(1), path)
    TxLog.setProperties(spark, path, Map(
      TxLog.ZorderColsProp -> "k,v", TxLog.BloomColsProp -> "k"))
    TxLog.renameColumn(spark, path, "k", "key_id")
    val props = TxLog.propertiesOf(spark, path)
    assert(props(TxLog.ZorderColsProp) == "key_id,v",
      s"zorderCols did not follow the rename: $props")
    assert(props(TxLog.BloomColsProp) == "key_id",
      s"bloomCols did not follow the rename: $props")
    // and the declared paths still WORK under the new name: a bare
    // OPTIMIZE resolves the clustering, a commit extends the sidecars
    TxLog.append(Seq((100L, 2.0)).toDF("key_id", "v"), path)
    TxLog.compact(spark, path)
    assert(TxLog.readByKey(spark, path, "key_id", 100L).count() == 1)
  }

  test("guard rails: constrained columns refuse rename, old readers refuse protocol 2, evolution cannot shadow a physical slot") {
    val path = freshPath("guards")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "part", "v"), path, Some("part"))
    TxLog.addConstraint(spark, path, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "v", "value")
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    // un-constrained column renames fine even while constraints exist
    TxLog.renameColumn(spark, path, "k", "key_id")
    // the rename commit is protocol 2 (a stale reader would surface
    // physical names — silently wrong — so it must refuse)
    val head = TxLog.currentVersion(spark, path).get
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_manifests/v$head.json")), "UTF-8")
    assert(txt.contains("\"protocol\" : 2"), txt.take(200))
    // evolution cannot add a column named like a renamed column's
    // physical slot
    val e2 = intercept[IllegalArgumentException] {
      TxLog.append(Seq((9L, "a", 9.0, "x"))
        .toDF("key_id", "part", "v", "k"), path, evolveSchema = true)
    }
    assert(e2.getMessage.contains("physical"), e2.getMessage)
    // the batch relation mounts column-mapped tables (logical names;
    // the HadoopFsRelation mount orders partition columns last)
    assert(spark.read.format("graft-txlog").option("path", path).load()
      .columns.toSet == Set("key_id", "part", "v"))
  }

  test("batch format reads a renamed table: logical names, exact values, pushdown on renamed columns") {
    val path = freshPath("fmt")
    TxLog.create(spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 4).cast("string").as("part"), (col("id") * 1.0).as("score"))
      .coalesce(1), path, Some("part"), statsCols = Seq("k"))
    Seq(100L, 200L).foreach(lo =>
      TxLog.append(spark.range(lo, lo + 100).select(col("id").as("k"),
        (col("id") % 4).cast("string").as("part"), (col("id") * 1.0).as("score"))
        .coalesce(1), path))
    TxLog.renameColumn(spark, path, "score", "quality")
    TxLog.renameColumn(spark, path, "k", "key_id")
    TxLog.renameColumn(spark, path, "part", "bucket")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("key_id", "bucket", "quality")
        .as[(Long, String, Double)].collect().toSet
    val viaFormat = spark.read.format("graft-txlog").option("path", path).load()
    // format mount ≡ TxLog.read, values under LOGICAL names (the
    // HadoopFsRelation mount orders partition columns last)
    assert(viaFormat.columns.toSet == Set("key_id", "bucket", "quality"))
    assert(rows(viaFormat) == rows(TxLog.read(spark, path)))
    def scansOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    // partition pruning through the renamed partition column: the
    // dirs spell the PHYSICAL name, the filter spells the logical one
    val q = viaFormat.filter(col("bucket") === "1" && col("quality") > 5.0)
      .select("key_id")
    assert(q.as[Long].collect().toSet ==
      (0 until 300).filter(i => i % 4 == 1 && i > 5).map(_.toLong).toSet)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    val p1Files = m.files.count(_.startsWith("part=1/"))
    assert(scansOf(q).map(_.selectedPartitions.totalNumberOfFiles).sum == p1Files,
      "partition pruning lost across the rename")
    // the data filter on a renamed column is still PUSHED (the scan
    // metadata spells the logical name; the format translates it to
    // the physical name before the parquet reader — value-pinned above)
    val pushed = q.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("quality"),
      s"renamed data filter not pushed: ${pushed.take(500)}")
    // manifest-stats skipping keyed physical still prunes via logical:
    // partition pruning leaves part=2's three files (k ranges 0-99,
    // 100-199, 200-299); the k stats admit exactly the third
    val sel = spark.read.format("graft-txlog").option("path", path).load()
      .filter(col("key_id") === 250L && col("bucket") === "2")
    assert(sel.count() == 1)
    assert(scansOf(sel).map(_.selectedPartitions.totalNumberOfFiles).sum == 1,
      "stats skipping lost across the rename")
    // time travel to the pre-rename version keeps the OLD names
    assert(spark.read.format("graft-txlog").option("path", path)
      .option("versionAsOf", "1").load().columns.toSet ==
      Set("k", "part", "score"))
  }
}
