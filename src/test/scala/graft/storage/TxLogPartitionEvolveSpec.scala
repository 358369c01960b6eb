package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-spec EVOLUTION: change a table's hidden layout as a
  * metadata commit. Old files keep their directories and stay
  * correct (hidden reads never recover dirs; votes fail open on
  * foreign dir names), new writes derive the new layout, rewrites
  * migrate files as a side effect, and the bucketed mount only
  * offers itself when EVERY live file sits in the current bucket
  * transform's own directories.
  */
class TxLogPartitionEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pevolve_$tag").toString + "/tbl"

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("unpartitioned → days(ts): old files stay put, new writes derive, queries stay exact") {
    val path = freshPath("flat2days")
    TxLog.create(Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0))
      .toDF("k", "ts", "v"), path)                            // flat files
    val before = TxLog.manifest(spark, path, 1L).files.toSet
    val v = TxLog.alterPartitionSpec(spark, path, Seq("days(ts)"))
    assert(v == 2L)
    assert(TxLog.manifest(spark, path, 2L).files.toSet == before,
      "evolution must move no data")
    TxLog.append(Seq((3L, ts(10), 3.0)).toDF("k", "ts", "v"), path)
    val m3 = TxLog.manifest(spark, path, 3L)
    val newFiles = m3.files.toSet -- before
    assert(newFiles.nonEmpty && newFiles.forall(_.startsWith("_days_ts=")),
      s"post-evolution writes must land in the derived layout: $newFiles")
    assert(before.forall(m3.files.contains), "old flat files carry")
    // a raw-timestamp range over the MIX is exact: new files prune by
    // dir votes, old files fail OPEN and filter on scan
    val got = TxLog.read(spark, path)
      .filter(col("ts") >= lit(ts(9)) && col("ts") <= lit(ts(11)))
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(3L))
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("days → bucket: rewrites migrate files; the bucketed mount waits for a full restage") {
    val path = freshPath("days2bucket")
    TxLog.create(Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0), (3L, ts(3), 3.0))
      .toDF("k", "ts", "v"), path, hiddenPartitions = Seq("days(ts)"))
    TxLog.alterPartitionSpec(spark, path, Seq("bucket(8, k)"))
    // mixed layout: the bucketed mount must NOT offer itself
    val mixed = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get)
    assert(graft.sources.TxLogBatch.bucketSpecOf(mixed).isEmpty,
      "old-layout files in the snapshot must disable the bucketed mount")
    // a rewrite migrates the touched rows into the NEW layout
    TxLog.updateWhere(spark, path, Seq("v" -> "v * 10"), col("k") === 2L)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.files.exists(_.startsWith("_bucket_k=")),
      "the rewrite must restage through the new layout")
    assert(TxLog.read(spark, path).orderBy("k").select("v").as[Double]
      .collect().toSeq == Seq(1.0, 20.0, 3.0))
    // OPTIMIZE migrates the whole table; the bucketed mount turns on
    TxLog.compact(spark, path, minFilesToCompact = 1)
    val after = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(after.files.forall(_.startsWith("_bucket_k=")),
      s"post-OPTIMIZE every file sits in the new layout: ${after.files}")
    assert(graft.sources.TxLogBatch.bucketSpecOf(after).isDefined,
      "a fully-restaged bucket layout mounts bucketed")
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("refusals: explicit layouts, semantic dir collisions, empty spec") {
    // explicit partition values live only in dirs — no evolution
    val explicitP = freshPath("explicit")
    TxLog.create(Seq((1L, "p1", 1.0)).toDF("k", "part", "v"), explicitP,
      Some("part"))
    intercept[IllegalArgumentException] {
      TxLog.alterPartitionSpec(spark, explicitP, Seq("bucket(4, k)"))
    }
    // bucket-width change shares `_bucket_k=` dirs with old semantics
    val widen = freshPath("widen")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), widen,
      hiddenPartitions = Seq("bucket(4, k)"))
    val e = intercept[IllegalArgumentException] {
      TxLog.alterPartitionSpec(spark, widen, Seq("bucket(8, k)"))
    }
    assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
    // re-declaring the SAME transform is fine (identity evolution)
    TxLog.alterPartitionSpec(spark, widen, Seq("bucket(4, k)"))
    // empty spec refuses
    intercept[IllegalArgumentException] {
      TxLog.alterPartitionSpec(spark, widen, Nil)
    }
    // a RENAMED source would derive dirs from a dangling logical name
    val renamed = freshPath("renamed")
    TxLog.create(Seq((1L, ts(1), 1.0)).toDF("k", "ts", "v"), renamed)
    TxLog.renameColumn(spark, renamed, "k", "id")
    val er = intercept[IllegalArgumentException] {
      TxLog.alterPartitionSpec(spark, renamed, Seq("bucket(4, id)"))
    }
    assert(er.getMessage.contains("RENAMED"), er.getMessage)
    // SQL verb round-trip
    val sqlP = freshPath("sql")
    TxLog.create(Seq((1L, ts(1), 1.0)).toDF("k", "ts", "v"), sqlP)
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$sqlP' SET HIDDEN PARTITION BY days(ts)")
    assert(TxLog.manifest(spark, sqlP,
      TxLog.currentVersion(spark, sqlP).get).partitionSpec == Seq("days(ts)"))
  }
}
