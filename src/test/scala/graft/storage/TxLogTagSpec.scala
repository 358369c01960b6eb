package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tags — named, retention-pinned snapshots: a tag is a NAME for a
  * committed version (no commit, no data movement), vacuum routes
  * retention cuts around tagged versions, and reads address tags via
  * the API, the SQL verbs, and the batch mount's `tagAsOf`. Writable
  * branches are shallow clones; tags are the immutable half.
  */
class TxLogTagSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tag_$tag").toString + "/tbl"

  test("tag names a version; reads address it; no commit happens") {
    val path = freshPath("basic")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)          // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), path)          // v2
    assert(TxLog.tag(spark, path, "run-1", Some(1L)) == 1L)
    assert(TxLog.tag(spark, path, "head_tag") == 2L)           // default: head
    assert(TxLog.currentVersion(spark, path).get == 2L,
      "tagging must not commit")
    assert(TxLog.readTag(spark, path, "run-1").count() == 1)
    assert(TxLog.readTag(spark, path, "head_tag").count() == 2)
    assert(TxLog.tags(spark, path) == Map("run-1" -> 1L, "head_tag" -> 2L))
    // the batch mount addresses tags too
    val mounted = spark.read.format("graft-txlog")
      .option("path", path).option("tagAsOf", "run-1").load()
    assert(mounted.count() == 1)
  }

  test("vacuum routes retention cuts around tagged versions; untag releases the pin") {
    val path = freshPath("pin")
    TxLog.create(Seq((1L, "p0", 1.0), (2L, "p0", 2.0))
      .toDF("k", "part", "v"), path, Some("part"))             // v1
    TxLog.deleteWhere(spark, path, col("k") === 1L)            // v2: strands v1's file
    TxLog.append(Seq((3L, "p0", 3.0)).toDF("k", "part", "v"), path) // v3
    TxLog.tag(spark, path, "pinned", Some(1L))
    TxLog.vacuum(spark, path, keepVersions = 1)
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.readTag(spark, path, "pinned").count() == 2,
      "the tagged version and its files must survive the cut")
    // v2 was neither retained nor tagged: gone
    intercept[Exception] { TxLog.read(spark, path, Some(2L)).count() }
    TxLog.untag(spark, path, "pinned")
    TxLog.vacuum(spark, path, keepVersions = 1)
    TxLog.flushSnapshotCacheForTesting()
    intercept[Exception] { TxLog.read(spark, path, Some(1L)).count() }
    assert(TxLog.read(spark, path).count() == 2)
  }

  test("refusals: duplicate name, unknown tag, bad name, unknown version") {
    val path = freshPath("refuse")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)
    TxLog.tag(spark, path, "t1")
    intercept[IllegalArgumentException] { TxLog.tag(spark, path, "t1") }
    intercept[IllegalArgumentException] { TxLog.tag(spark, path, "no spaces") }
    intercept[Exception] { TxLog.tag(spark, path, "t2", Some(99L)) }
    intercept[IllegalArgumentException] { TxLog.readTag(spark, path, "nope") }
    intercept[IllegalArgumentException] { TxLog.untag(spark, path, "nope") }
  }

  test("SQL verbs: TAG / TAGS / UNTAG round-trip") {
    val path = freshPath("sql")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), path)
    assert(graft.tools.Sql.exec(spark,
      s"TXLOG TAG '$path' release-1 VERSION 1").collect().head.getLong(0) == 1L)
    val listed = graft.tools.Sql.exec(spark, s"TXLOG TAGS '$path'")
      .as[(String, Long)].collect().toSeq
    assert(listed == Seq(("release-1", 1L)))
    // the read-only TVF serves the same listing as pure SQL
    assert(spark.sql(s"SELECT * FROM graft_txlog_tags('$path')")
      .as[(String, Long)].collect().toSeq == listed)
    graft.tools.Sql.exec(spark, s"TXLOG UNTAG '$path' release-1")
    assert(TxLog.tags(spark, path).isEmpty)
  }

  test("RESTORE TO TAG rolls back to the pinned snapshot; the tag survives") {
    val path = freshPath("restore")
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), path)          // v1
    TxLog.tag(spark, path, "train-run")                        // pins v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), path)          // v2
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), path)          // v3
    val v = TxLog.restoreToTag(spark, path, "train-run")       // v4 ≡ v1
    assert(v == 4L)
    assert(TxLog.read(spark, path).select("k").as[Long].collect().toSeq ==
      Seq(1L), "the head must show exactly the tagged snapshot")
    assert(TxLog.tags(spark, path) == Map("train-run" -> 1L),
      "restore names the version; the tag stays put")
    intercept[IllegalArgumentException] {
      TxLog.restoreToTag(spark, path, "nope")
    }
    // SQL form, and the TIMESTAMP/VERSION forms still dispatch around it
    TxLog.append(Seq((9L, "z")).toDF("k", "v"), path)          // v5
    graft.tools.Sql.exec(spark, s"TXLOG RESTORE '$path' TO TAG 'train-run'")
    assert(TxLog.read(spark, path).count() == 1)
    graft.tools.Sql.exec(spark, s"TXLOG RESTORE '$path' TO VERSION 5")
    assert(TxLog.read(spark, path).count() == 2)
  }
}
