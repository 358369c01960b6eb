package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ONE lifecycle across every r9 storage feature — the cross-feature
  * interactions are where a storage layer actually breaks, so this
  * drives them in sequence on a single table: multi-column layout +
  * skip stats + UNIQUE gate → file-granular merge → RENAME COLUMN →
  * deletion-vector delete → CDF across all of it → OPTIMIZE
  * materialization → restore → clone → vacuum, asserting row-exact
  * state at each step.
  */
class ModernLakeE2eSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_modern_$tag").toString + "/tbl"

  test("multi-col + UNIQUE + file-granular merge + rename + DV delete + CDF + OPTIMIZE + restore + clone + vacuum") {
    val path = freshPath("e2e")
    val d0 = Seq(
      ("d1", 0, 1L, 10.0), ("d1", 1, 2L, 20.0),
      ("d2", 0, 3L, 30.0), ("d2", 1, 4L, 40.0)
    ).toDF("date", "hour", "k", "score")
    TxLog.create(d0, path, partitionCols = Seq("date", "hour"),
      statsCols = Seq("k"))                                            // v1
    TxLog.addUniqueConstraint(spark, path, "pk_k", Seq("k"))           // v2
    def all(): Set[(String, Int, Long, Double)] =
      TxLog.read(spark, path).selectExpr("date", "hour", "k",
        TxLog.read(spark, path).columns.last)
        .as[(String, Int, Long, Double)].collect().toSet

    // file-granular merge on the two-col table: update k=2, insert k=5
    TxLog.mergeInto(path,
      Seq(("d1", 1, 2L, -20.0), ("d3", 0, 5L, 50.0))
        .toDF("date", "hour", "k", "score"), Seq("k"))                 // v3
    assert(all() == Set(("d1", 0, 1L, 10.0), ("d1", 1, 2L, -20.0),
      ("d2", 0, 3L, 30.0), ("d2", 1, 4L, 40.0), ("d3", 0, 5L, 50.0)))
    // UNIQUE still binds after the merge
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq(("d2", 0, 3L, 0.0)).toDF("date", "hour", "k", "score"),
        path)
    }

    // rename the value column — metadata only
    TxLog.renameColumn(spark, path, "score", "quality")                // v4
    assert(TxLog.read(spark, path).columns.toSeq ==
      Seq("date", "hour", "k", "quality"))
    // ... appends under the new name, UNIQUE still enforced (k untouched)
    TxLog.append(Seq(("d3", 1, 6L, 60.0)).toDF("date", "hour", "k", "quality"),
      path)                                                            // v5

    // DV delete on the renamed, two-col table: zero file changes
    val filesBefore = TxLog.manifest(spark, path, 5L).files.toSet
    TxLog.deleteWhere(spark, path, col("k") === 4L, deletionVectors = true) // v6
    assert(TxLog.manifest(spark, path, 6L).files.toSet == filesBefore,
      "DV delete must not change the file set")
    assert(all() == Set(("d1", 0, 1L, 10.0), ("d1", 1, 2L, -20.0),
      ("d2", 0, 3L, 30.0), ("d3", 0, 5L, 50.0), ("d3", 1, 6L, 60.0)))
    assert(TxLog.fastCount(spark, path).contains(5L))

    // CDF v1 -> v6 spans the merge, the rename AND the DV delete:
    // physical identity keeps the rename silent; net changes only
    val feed = TxLog.changes(spark, path, 1L, 6L, Seq("k"))
    assert(feed.columns.contains("quality"))
    val byKey = feed.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("_change_type")).toMap
    assert(byKey == Map(2L -> "update", 4L -> "delete",
      5L -> "insert", 6L -> "insert"), byKey.toString)

    // OPTIMIZE materializes the DV and compacts the two-col layout
    val v7 = TxLog.compact(spark, path, minFilesToCompact = 1)
    assert(TxLog.manifest(spark, path, v7).dv.isEmpty)
    assert(all() == Set(("d1", 0, 1L, 10.0), ("d1", 1, 2L, -20.0),
      ("d2", 0, 3L, 30.0), ("d3", 0, 5L, 50.0), ("d3", 1, 6L, 60.0)))
    // a UNIQUE-clean append flows post-materialization
    TxLog.append(Seq(("d1", 0, 7L, 70.0)).toDF("date", "hour", "k", "quality"),
      path)                                                            // v8

    // time travel across the whole history keeps each version's OWN
    // schema: v3 predates the rename
    assert(TxLog.read(spark, path, Some(3L)).columns.toSeq ==
      Seq("date", "hour", "k", "score"))

    // restore to the pre-delete v5: row AND name state both roll back
    TxLog.restore(spark, path, 5L)                                     // v9
    assert(TxLog.read(spark, path).filter(col("k") === 4L).count() == 1)
    assert(TxLog.read(spark, path).columns.contains("quality"))

    // clone the restored head; the clone reads identically and
    // diverges independently
    val tgt = freshPath("e2e_clone")
    TxLog.clone(spark, path, tgt)
    assert(TxLog.read(spark, tgt).count() == TxLog.read(spark, path).count())
    TxLog.deleteWhere(spark, tgt, col("k") === 1L, deletionVectors = true)
    assert(TxLog.read(spark, tgt).count() ==
      TxLog.read(spark, path).count() - 1)
    assert(TxLog.read(spark, path).filter(col("k") === 1L).count() == 1,
      "clone write leaked into the source")

    // vacuum the source to the head only; it still reads exactly
    val want = TxLog.read(spark, path).collect().map(_.toString).sorted
    TxLog.vacuum(spark, path, keepVersions = 1)
    assert(TxLog.read(spark, path).collect().map(_.toString).sorted
      .sameElements(want))
    // history is capped but the head resolves from its checkpointed/
    // full state — and the minWriter gate is still 2 (constraints +
    // multi-col + rename all demanded it)
    assert(TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).minWriter == 2)
  }
}
