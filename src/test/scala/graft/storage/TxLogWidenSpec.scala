package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** ALTER COLUMN ... TYPE — type WIDENING as a METADATA-ONLY commit.
  *
  * The declared schema re-types the column; every historical file
  * keeps its narrower physical encoding and Spark 4's parquet readers
  * promote in place (int32→int64/double, float→double, decimal
  * rescale) — these specs ARE the empirical pin of that contract for
  * this build, per lattice edge, through TxLog.read AND the batch
  * mount. Narrowing/cross-family retyping, layout keys, and transform
  * sources refuse loudly.
  */
class TxLogWidenSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_widen_$tag").toString + "/tbl"

  test("int -> bigint is metadata-only; mixed-era files read and aggregate exactly") {
    val path = freshPath("i2l")
    TxLog.create(Seq((1, "a"), (2, "b")).toDF("k", "name"), path)
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    val v = TxLog.alterColumnType(spark, path, "k", "bigint")
    assert(v == 2L)
    assert(TxLog.manifest(spark, path, 2L).files.toSet == filesBefore,
      "ALTER COLUMN TYPE must not move data")
    assert(TxLog.read(spark, path).schema("k").dataType == LongType)
    // post-widen appends carry genuinely long values
    TxLog.append(Seq((5000000000L, "c")).toDF("k", "name"), path)
    val head = TxLog.read(spark, path)
    assert(head.agg(sum("k")).head().getLong(0) == 5000000003L,
      "int-era and long-era files must aggregate together exactly")
    assert(head.filter(col("k") > Int.MaxValue).count() == 1)
    // version-pinned read of the pre-widen snapshot keeps its own type
    assert(TxLog.read(spark, path, Some(1L)).schema("k").dataType == IntegerType)
  }

  test("every lattice edge reads back value-exact through historical files") {
    // one table per edge: write narrow, widen, read wide — the read
    // through the ORIGINAL file is the promotion under test
    def roundTrip[T](tag: String, df: org.apache.spark.sql.DataFrame,
                     colName: String, ddl: String, wide: DataType,
                     expect: Any): Unit = {
      val path = freshPath(tag)
      TxLog.create(df, path)
      TxLog.alterColumnType(spark, path, colName, ddl)
      val out = TxLog.read(spark, path)
      assert(out.schema(colName).dataType == wide, s"$tag: schema")
      val got = out.agg(sum(col(colName))).head().get(0)
      assert(got == expect, s"$tag: sum read $got, expected $expect")
    }
    roundTrip("b2i", Seq((1.toByte, "x"), (2.toByte, "y")).toDF("v", "pad"),
      "v", "int", IntegerType, 3L)
    roundTrip("s2l", Seq((10.toShort, "x"), (20.toShort, "y")).toDF("v", "pad"),
      "v", "bigint", LongType, 30L)
    roundTrip("i2d", Seq((3, "x"), (4, "y")).toDF("v", "pad"),
      "v", "double", DoubleType, 7.0)
    roundTrip("f2d", Seq((1.5f, "x"), (2.5f, "y")).toDF("v", "pad"),
      "v", "double", DoubleType, 4.0)
    roundTrip("dec", Seq(("x", BigDecimal("1.25")), ("y", BigDecimal("2.25")))
      .toDF("pad", "v")
      .select(col("pad"), col("v").cast(DecimalType(5, 2)).as("v")),
      "v", "decimal(12,4)", DecimalType(12, 4),
      new java.math.BigDecimal("3.5000"))
  }

  test("narrowing, cross-family, layout keys and unknown columns refuse") {
    val path = freshPath("refuse")
    TxLog.create(Seq((1L, "p1", 3), (2L, "p2", 4)).toDF("k", "part", "n"),
      path, Some("part"))
    intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, path, "k", "int") // narrowing
    }
    intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, path, "n", "string") // cross-family
    }
    intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, path, "part", "bigint") // dir-typed values
    }
    intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, path, "nope", "bigint") // unknown
    }
    intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, path, "n", "int") // already that type
    }
    // hidden bucket(n, c) votes hash the value BYTES — int 3 and long 3
    // hash apart, so the source column's type is load-bearing
    val hp = freshPath("refuse_hidden")
    TxLog.create(Seq((1, "x"), (2, "y")).toDF("k", "v"), hp,
      hiddenPartitions = Seq("bucket(4, k)"))
    intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, hp, "k", "bigint")
    }
  }

  test("skip-index entries written int-era still prune exactly under the wide type") {
    val path = freshPath("stats")
    TxLog.create(Seq((1, "a"), (3, "b")).toDF("k", "name"), path,
      statsCols = Seq("k"))
    TxLog.append(Seq((100, "c"), (200, "d")).toDF("k", "name"), path)
    val before = TxLog.prunedFiles(spark, path, "k", 100, 200).toSet
    TxLog.alterColumnType(spark, path, "k", "bigint")
    // same files survive the same range under LONG bounds — the
    // int-era entries ("1","3","100","200") vote as BigDecimal
    val after = TxLog.prunedFiles(spark, path, "k", 100L, 200L).toSet
    assert(after == before, "widening must not change pruning votes")
    assert(after.size < TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).files.size,
      "the low-range file must still prune")
    // a beyond-int bound prunes everything int-era admits nothing of
    TxLog.append(Seq((6000000000L, "e")).toDF("k", "name"), path)
    val far = TxLog.prunedFiles(spark, path, "k", 5000000000L, 7000000000L)
    assert(far.size == 1, s"only the long-era file admits the far range: $far")
    assert(TxLog.readBetween(spark, path, "k", 5000000000L, 7000000000L)
      .count() == 1)
  }

  test("batch mount reads the widened table: schema, values, pushdown") {
    val path = freshPath("mount")
    TxLog.create(Seq((1, "a"), (2, "b")).toDF("k", "name"), path)
    TxLog.alterColumnType(spark, path, "k", "bigint")
    TxLog.append(Seq((5000000000L, "c")).toDF("k", "name"), path)
    val mounted = spark.read.format("graft-txlog").option("path", path).load()
    assert(mounted.schema("k").dataType == LongType)
    val viaApi = TxLog.read(spark, path).orderBy("k").collect().toSeq
    assert(mounted.orderBy("k").collect().toSeq == viaApi,
      "mount ≡ TxLog.read across the widen")
    val q = mounted.filter(col("k") > Int.MaxValue.toLong)
    assert(q.count() == 1)
    val pushed = q.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("k"),
      s"filter on the widened column not pushed: ${pushed.take(300)}")
  }

  test("appends must arrive already widened; DV deletes survive the widen") {
    val path = freshPath("mix")
    TxLog.create(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "name"), path)
    TxLog.deleteWhere(spark, path, col("k") === 2, deletionVectors = true)
    TxLog.alterColumnType(spark, path, "k", "bigint")
    // the DV rides the metadata commit: still exactly one row gone
    assert(TxLog.read(spark, path).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))
    // checkSchema's exact-match contract: an int frame refuses post-widen
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((4, "d")).toDF("k", "name"), path)
    }
    TxLog.append(Seq((4L, "d")).toDF("k", "name"), path)
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("SQL verb: TXLOG ALTER ... ALTER COLUMN ... TYPE (no regex shadowing)") {
    val path = freshPath("sql")
    TxLog.create(Seq((1, "a"), (2, "b")).toDF("k", "name"), path)
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' ALTER COLUMN k TYPE bigint")
    assert(TxLog.read(spark, path).schema("k").dataType == LongType)
    // sibling ALTER verbs still parse around the new regex
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' ADD COLUMN note string")
    graft.tools.Sql.exec(spark, s"TXLOG ALTER '$path' RENAME COLUMN note TO memo")
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "name", "memo"))
  }

  test("widening invalidates rendering-sensitive Bloom sidecars, keeps stable ones") {
    // sidecars hash xxhash64 of the value's STRING rendering: "3"
    // under int, "3.0" under double. A widen that changes the
    // rendering must drop the sidecar dir (missing = conservatively
    // kept) or every point probe turns into a silent false negative.
    val stable = freshPath("bloomstable")
    TxLog.create(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "name"), stable)
    TxLog.buildBloomIndex(spark, stable, "k")
    val stableDir = new java.io.File(stable, "_index/bloom/k")
    assert(stableDir.exists, "index built")
    TxLog.alterColumnType(spark, stable, "k", "bigint") // "3" stays "3"
    assert(stableDir.exists, "integer-family widen must keep the sidecars")
    assert(TxLog.readByKey(spark, stable, "k", 3L).count() == 1,
      "stable-rendering probe must still find the row")

    val unstable = freshPath("bloomdrop")
    TxLog.create(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "name"), unstable)
    TxLog.buildBloomIndex(spark, unstable, "k")
    val dropDir = new java.io.File(unstable, "_index/bloom/k")
    assert(dropDir.exists, "index built")
    TxLog.alterColumnType(spark, unstable, "k", "double") // "3" -> "3.0"
    assert(!dropDir.exists,
      "int->double widen must drop the sidecar dir — probes hash \"3.0\" " +
        "against filters built from \"3\"")
    assert(TxLog.prunedFilesByKey(spark, unstable, "k", 3.0).nonEmpty,
      "pruning must keep candidate files after the widen")
    assert(TxLog.readByKey(spark, unstable, "k", 3.0).count() == 1,
      "post-widen point lookup must not lose rows to a stale sidecar")
  }

  test("history records the operation; time travel spans the type change") {
    val path = freshPath("hist")
    TxLog.create(Seq((7, "a")).toDF("k", "name"), path)
    TxLog.alterColumnType(spark, path, "k", "bigint")
    val ops = TxLog.history(spark, path).select("operation")
      .as[String].collect().toSeq
    assert(ops.exists(_.contains("ALTER COLUMN k TYPE bigint")), ops.toString)
    // CDF across the metadata commit: zero row changes
    assert(TxLog.changes(spark, path, 1L, 2L, Seq("k")).count() == 0)
  }
}
