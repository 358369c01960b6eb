package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ADD COLUMN / DROP COLUMN — schema evolution as METADATA commits.
  *
  * ADD widens the schema by a nullable field: historical files read
  * NULL (the parquet missing-column contract), later writes carry it,
  * zero rewrites. DROP removes the field but leaves the bytes in
  * place behind a colMap TOMBSTONE that reserves the physical slot —
  * so a later column re-using the name maps to a FRESH slot and the
  * old values never resurrect (the hazard Delta gates DROP COLUMN on
  * column mapping for). OPTIMIZE physically purges dropped bytes
  * because its rewrite reads through the post-drop logical schema.
  */
class TxLogEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_evolve_$tag").toString + "/tbl"

  test("addColumn is metadata-only: old rows read null, appends carry values") {
    val path = freshPath("add")
    TxLog.create(Seq((1L, "a"), (2L, "b")).toDF("k", "name"), path)
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    val v = TxLog.addColumn(spark, path, "score", "double")
    assert(v == 2L)
    assert(TxLog.manifest(spark, path, 2L).files.toSet == filesBefore,
      "ADD COLUMN must not move data")
    val head = TxLog.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "name", "score"))
    assert(head.filter(col("score").isNull).count() == 2,
      "pre-add rows read NULL for the new column")
    TxLog.append(Seq((3L, "c", 9.5)).toDF("k", "name", "score"), path)
    assert(TxLog.read(spark, path).filter(col("k") === 3L)
      .select("score").as[Double].head() == 9.5)
    // version-pinned read of the pre-add snapshot keeps its own schema
    assert(TxLog.read(spark, path, Some(1L)).columns.toSeq == Seq("k", "name"))
    // duplicate add refuses
    intercept[IllegalArgumentException] {
      TxLog.addColumn(spark, path, "score", "double")
    }
  }

  test("dropColumn hides the field; version-pinned reads still see it") {
    val path = freshPath("drop")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "score"),
      path)
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    val v = TxLog.dropColumn(spark, path, "score")
    assert(v == 2L)
    assert(TxLog.manifest(spark, path, 2L).files.toSet == filesBefore,
      "DROP COLUMN must not rewrite data")
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "name"))
    // time travel: the pre-drop version surfaces the column with values
    val v1 = TxLog.read(spark, path, Some(1L))
    assert(v1.columns.toSeq == Seq("k", "name", "score"))
    assert(v1.select(sum("score")).head().getDouble(0) == 3.0)
    // post-drop appends provide only the live schema
    TxLog.append(Seq((3L, "c")).toDF("k", "name"), path)
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("re-added name maps to a fresh physical slot: dropped values never resurrect") {
    val path = freshPath("readd")
    TxLog.create(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "score"), path)
    TxLog.dropColumn(spark, path, "score")                      // v2
    TxLog.addColumn(spark, path, "score", "double")             // v3
    val head = TxLog.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "score"))
    assert(head.filter(col("score").isNotNull).count() == 0,
      "the re-added column must NOT read the dropped column's bytes")
    // new values land under the fresh slot and read back
    TxLog.append(Seq((3L, 30.0)).toDF("k", "score"), path)
    assert(TxLog.read(spark, path).agg(sum("score")).head().getDouble(0) == 30.0)
    // the mapping is real: the manifest maps the logical name away
    // from the tombstoned physical slot
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.colMap.exists { case (l, p) => l == "score" && p != "score" })
    assert(m.colMap.exists { case (l, p) => l.startsWith("#dropped:") && p == "score" })
  }

  test("drop of a RENAMED column tombstones its original physical slot") {
    val path = freshPath("renamedrop")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "raw"), path)
    TxLog.renameColumn(spark, path, "raw", "score")             // v2
    TxLog.dropColumn(spark, path, "score")                      // v3
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k"))
    // re-adding the ORIGINAL name must not resurrect either: the files
    // spell 'raw' physically and that slot is tombstoned
    TxLog.addColumn(spark, path, "raw", "double")               // v4
    assert(TxLog.read(spark, path).filter(col("raw").isNotNull).count() == 0)
  }

  test("batch-format mount sees the evolved schema: nulls, fresh slots, pushdown") {
    val path = freshPath("mount")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "score"),
      path)
    TxLog.dropColumn(spark, path, "score")
    TxLog.addColumn(spark, path, "score", "double")
    TxLog.append(Seq((3L, "c", 30.0)).toDF("k", "name", "score"), path)
    val mounted = spark.read.format("graft-txlog").option("path", path).load()
    assert(mounted.columns.toSet == Set("k", "name", "score"))
    assert(mounted ne null)
    val viaApi = TxLog.read(spark, path)
      .select("k", "name", "score").orderBy("k").collect().toSeq
    val viaMount = mounted
      .select("k", "name", "score").orderBy("k").collect().toSeq
    assert(viaMount == viaApi, "mount ≡ TxLog.read after add/drop/re-add")
    // filters on the re-added (mapped) column still work through the mount
    assert(mounted.filter(col("score") > 10.0).count() == 1)
  }

  test("OPTIMIZE physically purges dropped bytes (rewrite reads the logical schema)") {
    val path = freshPath("purge")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "secret"),
      path)
    TxLog.dropColumn(spark, path, "secret")
    TxLog.compact(spark, path)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    m.files.foreach { f =>
      val cols = spark.read.parquet(s"$path/data/$f").columns.toSet
      assert(!cols.contains("secret"),
        s"compacted file $f still spells the dropped column")
    }
    assert(TxLog.read(spark, path).orderBy("k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("layout and constraint dependencies refuse the drop") {
    val path = freshPath("refuse")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p2", 2.0)).toDF("k", "part", "score"),
      path, Some("part"))
    TxLog.addConstraint(spark, path, "pos_score", "score >= 0")
    TxLog.addUniqueConstraint(spark, path, "uk", Seq("k"))
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, path, "part") // partition column
    }
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, path, "score") // CHECK references it
    }
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, path, "k") // UNIQUE keys on it
    }
    // hidden-transform source refuses too
    val hp = freshPath("refuse_hidden")
    TxLog.create(Seq((1L, "x"), (2L, "y")).toDF("k", "v"), hp,
      hiddenPartitions = Seq("bucket(4, k)"))
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, hp, "k")
    }
    // evolve-append of a dropped name points at addColumn instead
    val dp = freshPath("refuse_evolve")
    TxLog.create(Seq((1L, 1.0)).toDF("k", "gone"), dp)
    TxLog.dropColumn(spark, dp, "gone")
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, 2.0)).toDF("k", "gone"), dp, evolveSchema = true)
    }
    assert(e.getMessage.contains("addColumn"))
  }

  test("SQL verbs: ALTER ADD COLUMN / DROP COLUMN commit and read back") {
    val path = freshPath("sql")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "score"),
      path)
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' DROP COLUMN score")
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' ADD COLUMN note string")
    val head = TxLog.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "name", "note"))
    assert(head.filter(col("note").isNull).count() == 2)
    // the constraint verbs still parse (no regex shadowing)
    graft.tools.Sql.exec(spark,
      s"TXLOG ALTER '$path' ADD CONSTRAINT k_pos CHECK (k > 0)")
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' DROP CONSTRAINT k_pos")
  }

  test("CDF across a drop + re-add: no spurious updates from the metadata commits") {
    val path = freshPath("cdf")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "score"),
      path)
    TxLog.dropColumn(spark, path, "score")                      // v2
    // pure metadata: zero row changes (the dropped column leaves the
    // compared schema — its values didn't "change", they left scope)
    assert(TxLog.changes(spark, path, 1L, 2L, Seq("k")).count() == 0)
    TxLog.addColumn(spark, path, "score", "double")             // v3
    assert(TxLog.changes(spark, path, 2L, 3L, Seq("k")).count() == 0)
    // a real post-evolution change surfaces normally
    TxLog.append(Seq((3L, "c", 3.0)).toDF("k", "name", "score"), path) // v4
    val feed = TxLog.changes(spark, path, 3L, 4L, Seq("k")).collect()
    assert(feed.length == 1 && feed.head.getAs[String]("_change_type") == "insert")
  }

  test("skip stats survive a drop of an untracked column; tracked column drop untracks it") {
    val path = freshPath("stats")
    TxLog.create(Seq((1L, "a", 1.0), (50L, "b", 2.0)).toDF("k", "name", "score"),
      path, statsCols = Seq("k", "score"))
    TxLog.dropColumn(spark, path, "score")
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.statsCols == Seq("k"), "dropped column leaves the skip set")
    // pruning on the surviving tracked column still plans correctly
    assert(TxLog.read(spark, path).filter(col("k") > 10L).count() == 1)
  }
}
