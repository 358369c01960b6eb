package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate-scoped atomic overwrite (Delta's `replaceWhere`) — the
  * backfill verb: only the matching region replaces, only the files
  * holding a matching row rewrite, incoming rows must stay inside the
  * region, and UNIQUE keys probe the POST-replace state. */
class TxLogReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rw_$tag").toString + "/t"

  test("replaceWhere: the region replaces, untouched files carry by reference") {
    val path = fresh("basic")
    TxLog.create(Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
      .toDF("k", "part", "v"), path, Some("part"))
    val pre = TxLog.manifest(spark, path, 1L)
    val v2 = TxLog.replaceWhere(
      Seq((10L, "a", 10.0), (11L, "a", 11.0), (12L, "a", 12.0))
        .toDF("k", "part", "v"),
      path, col("part") === "a")
    assert(v2 == 2L)
    val got = TxLog.read(spark, path)
      .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
    assert(got == Set((10L, "a", 10.0), (11L, "a", 11.0), (12L, "a", 12.0),
      (3L, "b", 3.0), (4L, "c", 4.0)),
      s"region must replace whole, rest untouched: $got")
    // file economics: the b/c files carry into v2 BY REFERENCE
    val m2 = TxLog.manifest(spark, path, 2L)
    val untouched = pre.files.filterNot(_.startsWith("part=a/"))
    assert(untouched.forall(m2.files.contains),
      s"untouched files must carry by reference: ${m2.files}")
    assert(pre.files.filter(_.startsWith("part=a/"))
      .forall(f => !m2.files.contains(f)),
      "replaced-region files must leave the manifest")
    // time travel to the pre-replace snapshot intact
    assert(TxLog.read(spark, path, Some(1L)).count() == 4L)
  }

  test("replaceWhere on a non-partition predicate rewrites only admitting files; survivors carry verbatim") {
    val path = fresh("rows")
    // two stat-disjoint files via coalesced appends
    TxLog.create(spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 1.0).as("v")).coalesce(1), path, statsCols = Seq("k"))
    TxLog.append(spark.range(100, 200).select(col("id").as("k"),
      (col("id") * 1.0).as("v")).coalesce(1), path)
    val pre = TxLog.manifest(spark, path, 2L)
    // replace k in [150, 160): hits only the second file
    TxLog.replaceWhere(
      spark.range(150, 160).select(col("id").as("k"), lit(-1.0).as("v")),
      path, col("k") >= 150L && col("k") < 160L)
    val m = TxLog.manifest(spark, path, 3L)
    assert(pre.files.take(1).forall(m.files.contains),
      "the un-hit first file must carry by reference")
    val out = TxLog.read(spark, path)
    assert(out.count() == 200L)
    assert(out.filter(col("v") === -1.0).count() == 10L)
    assert(out.filter(col("k") === 100L).select("v").as[Double].head() == 100.0,
      "survivor rows of the hit file must carry verbatim")
  }

  test("incoming rows outside the region refuse before anything stages") {
    val path = fresh("outside")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v"),
      path, Some("part"))
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(Seq((9L, "b", 9.0)).toDF("k", "part", "v"),
        path, col("part") === "a")
    }
    assert(e.getMessage.contains("do not satisfy"), e.getMessage)
    assert(TxLog.currentVersion(spark, path).contains(1L),
      "a refused replaceWhere must commit nothing")
  }

  test("empty region = a plain insert; appendOnly refuses; UNIQUE probes the post-replace state") {
    val path = fresh("edges")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v"),
      path, Some("part"))
    TxLog.addUniqueConstraint(spark, path, "pk", Seq("k"))
    // the backfill's whole point: re-presenting a key that lives ONLY
    // inside the replaced region must pass
    TxLog.replaceWhere(Seq((1L, "a", 10.0)).toDF("k", "part", "v"),
      path, col("part") === "a")
    assert(TxLog.read(spark, path).filter(col("k") === 1L)
      .select("v").as[Double].head() == 10.0)
    // colliding with a key OUTSIDE the region refuses
    val eU = intercept[Exception] {
      TxLog.replaceWhere(Seq((2L, "a", 20.0)).toDF("k", "part", "v"),
        path, col("part") === "a")
    }
    assert(eU.getMessage.contains("pk"), eU.getMessage)
    // empty region (no 'z' rows exist): the batch just inserts
    val vIns = TxLog.replaceWhere(Seq((9L, "z", 9.0)).toDF("k", "part", "v"),
      path, col("part") === "z")
    assert(TxLog.read(spark, path, Some(vIns)).count() == 3L)
    // appendOnly: rows are removed, so the verb refuses
    TxLog.setProperties(spark, path, Map(TxLog.AppendOnlyProp -> "true"))
    val eA = intercept[UnsupportedOperationException] {
      TxLog.replaceWhere(Seq((1L, "a", 0.0)).toDF("k", "part", "v"),
        path, col("part") === "a")
    }
    assert(eA.getMessage.contains(TxLog.AppendOnlyProp), eA.getMessage)
  }

  test("replaceWhere on a HIDDEN-partitioned table: restage rides the transform layout") {
    val path = fresh("hidden")
    TxLog.create(Seq(
      (1L, "2026-01-01", 1.0), (2L, "2026-01-01", 2.0),
      (3L, "2026-02-01", 3.0))
      .toDF("k", "d", "v")
      .select(col("k"), col("d").cast("date").as("d"), col("v")),
      path, hiddenPartitions = Seq("days(d)"))
    TxLog.replaceWhere(
      Seq((10L, "2026-01-01", 10.0)).toDF("k", "d", "v")
        .select(col("k"), col("d").cast("date").as("d"), col("v")),
      path, col("d") === lit("2026-01-01").cast("date"))
    val got = TxLog.read(spark, path).select("k").as[Long].collect().toSet
    assert(got == Set(10L, 3L),
      s"hidden-partitioned region must replace whole: $got")
    // the incoming file landed under the TRANSFORM's derived directory
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.files.forall(_.contains("=")),
      s"restaged files must ride the hidden layout: ${m.files}")
  }

  test("Spark's own INSERT INTO ... REPLACE WHERE lowers onto replaceWhere through the V2 catalog") {
    val w = java.nio.file.Files.createTempDirectory("graft_rw_v2").toString
    val prev = spark.conf.getOption("graft.catalog.warehouse")
    spark.conf.set("graft.catalog.warehouse", w)
    try {
      spark.sql("CREATE TABLE graft.rwv2 (k BIGINT, seg STRING, v DOUBLE)")
      spark.sql("INSERT INTO graft.rwv2 VALUES " +
        "(1, 'a', 1.0), (2, 'a', 2.0), (3, 'b', 3.0)")
      spark.sql("INSERT INTO graft.rwv2 REPLACE WHERE seg = 'a' " +
        "VALUES (10, 'a', 10.0)")
      val got = spark.sql("SELECT k FROM graft.rwv2 ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(3L, 10L), s"V2 REPLACE WHERE diverged: $got")
      import spark.implicits._
      val ops = TxLog.history(spark, s"$w/rwv2").select("operation")
        .as[String].collect().toSeq
      assert(ops.contains("REPLACE WHERE"), ops.toString)
      // rows outside the region refuse through this door too
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.rwv2 REPLACE WHERE seg = 'a' " +
          "VALUES (9, 'b', 9.0)")
      }
      assert(e.getMessage.contains("do not satisfy"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.rwv2")
      prev match {
        case Some(v) => spark.conf.set("graft.catalog.warehouse", v)
        case None => spark.conf.unset("graft.catalog.warehouse")
      }
    }
  }

  test("the format door and the TXLOG verb spell the same replace") {
    val path = fresh("doors")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "v"),
      path, Some("part"))
    Seq((10L, "a", 10.0)).toDF("k", "part", "v").write
      .format("graft-txlog").mode("overwrite")
      .option("path", path).option("replaceWhere", "part = 'a'").save()
    assert(TxLog.read(spark, path)
      .select("k").as[Long].collect().toSet == Set(10L, 2L),
      "format-door replaceWhere diverged")
    Seq((20L, "b", 20.0)).toDF("k", "part", "v")
      .createOrReplaceTempView("rw_src")
    graft.tools.Sql.exec(spark,
      s"TXLOG REPLACE INTO '$path' WHERE (part = 'b') SELECT * FROM rw_src")
    assert(TxLog.read(spark, path)
      .select("k").as[Long].collect().toSet == Set(10L, 20L),
      "TXLOG REPLACE INTO ... WHERE diverged")
    // history names the operation
    val ops = TxLog.history(spark, path).select("operation")
      .as[String].collect().toSeq
    assert(ops.count(_ == "REPLACE WHERE") == 2, ops.toString)
  }
}
