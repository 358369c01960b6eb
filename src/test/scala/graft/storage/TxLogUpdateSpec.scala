package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UPDATE ... SET ... WHERE — file-granular rewrite (only files that
  * admit a matching row rewrite; the rest carry by reference) and the
  * merge-on-read DV form (matched rows DV away, updated images
  * append, both derived from ONE materialization so a
  * non-deterministic condition can never diverge the two sets).
  */
class TxLogUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_update_$tag").toString + "/tbl"

  test("rewrite mode: only hit files rewrite; values update; NULL condition rows stay") {
    val path = freshPath("rewrite")
    // two partitions → two files; the condition only matches p1
    TxLog.create(Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0),
      (4L, "p2", java.lang.Double.NaN)).toDF("k", "part", "score")
      .withColumn("score", when(col("k") === 4L, lit(null)).otherwise(col("score"))),
      path, Some("part"))
    val before = TxLog.manifest(spark, path, 1L).files
    TxLog.updateWhere(spark, path,
      Seq("score" -> "score * 2"), col("part") === "p1" && col("score") > 15.0)
    val m2 = TxLog.manifest(spark, path, 2L)
    // the p2 file never matched: carried by reference, not rewritten
    assert(before.filter(_.startsWith("part=p2")).forall(m2.files.contains),
      "unmatched files must carry by reference")
    // file-granular: only the p1 file(s) that ADMIT a matching row
    // leave; a p1 file holding only non-matching rows carries too
    assert(before.filter(_.startsWith("part=p1")).exists(f => !m2.files.contains(f)),
      "at least one matched file must leave the manifest")
    val got = TxLog.read(spark, path).orderBy("k")
      .select("k", "score").collect().map(r =>
        (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(1L -> Some(10.0), 2L -> Some(40.0),
      3L -> Some(30.0), 4L -> None),
      "only the matched row updates; NULL-condition rows stay")
  }

  test("DV mode: matched files stay, rows DV away, images append — one materialization") {
    val path = freshPath("dv")
    TxLog.create((1L to 100L).map(i => (i, s"s$i", i * 1.0))
      .toDF("k", "name", "score"), path)
    val before = TxLog.manifest(spark, path, 1L).files.toSet
    TxLog.updateWhere(spark, path,
      Seq("score" -> "score + 1000", "name" -> "concat(name, '_upd')"),
      col("k") % 10 === 0, deletionVectors = true)
    val m2 = TxLog.manifest(spark, path, 2L)
    assert(before.subsetOf(m2.files.toSet),
      "DV update must not rewrite any admitting file")
    assert(m2.dv.flatMap(_._2.values).sum == 10, "10 matched rows DV away")
    val head = TxLog.read(spark, path)
    assert(head.count() == 100)
    assert(head.filter(col("k") === 50L).select("score", "name")
      .as[(Double, String)].head() == ((1050.0, "s50_upd")))
    assert(head.filter(col("score") > 1000.0).count() == 10)
    // the one-materialization temp dir is gone
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("_tmp_update_"))
    assert(leftovers.isEmpty, "the matched-set materialization must clean up")
  }

  test("updating a partition column relocates rows into their new directory") {
    val path = freshPath("relocate")
    TxLog.create(Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "part", "score"), path, Some("part"))
    TxLog.updateWhere(spark, path, Seq("part" -> "'p9'"), col("k") === 2L)
    val m2 = TxLog.manifest(spark, path, 2L)
    assert(m2.files.exists(_.startsWith("part=p9/")),
      "the updated row restages into its new partition directory")
    assert(TxLog.read(spark, path).filter(col("part") === "p9")
      .select("k").as[Long].collect().toSeq == Seq(2L))
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("refusals: unknown column, UNIQUE key column, CHECK violation") {
    val path = freshPath("refuse")
    TxLog.create(Seq((1L, 5.0), (2L, 6.0)).toDF("k", "score"), path)
    TxLog.addConstraint(spark, path, "pos", "score >= 0")
    TxLog.addUniqueConstraint(spark, path, "uk", Seq("k"))
    intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, path, Seq("nope" -> "1"), lit(true))
    }
    intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, path, Seq("k" -> "k + 100"), lit(true))
    }
    intercept[Exception] {
      TxLog.updateWhere(spark, path, Seq("score" -> "-1.0"), col("k") === 1L)
    }
    // nothing committed by the refusals
    assert(TxLog.currentVersion(spark, path).get == 3L) // create + 2 constraints
  }

  test("SQL verbs: TXLOG UPDATE, plain and USING DELETION VECTORS") {
    val path = freshPath("sql")
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "score"), path)
    graft.tools.Sql.exec(spark,
      s"TXLOG UPDATE '$path' SET score = score * 10, name = upper(name) " +
        "WHERE k <= 2")
    assert(TxLog.read(spark, path).orderBy("k")
      .select("name", "score").as[(String, Double)].collect().toSeq ==
      Seq(("A", 10.0), ("B", 20.0), ("c", 3.0)))
    graft.tools.Sql.exec(spark,
      s"TXLOG UPDATE '$path' SET score = case when k = 3 then 99.0 else score end " +
        "WHERE k = 3 USING DELETION VECTORS")
    assert(TxLog.read(spark, path).filter(col("k") === 3L)
      .select("score").as[Double].head() == 99.0)
    assert(TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).dv.nonEmpty)
  }

  test("update through a rename: SET addresses the LOGICAL name") {
    val path = freshPath("renamed")
    TxLog.create(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "raw"), path)
    TxLog.renameColumn(spark, path, "raw", "score")
    TxLog.updateWhere(spark, path, Seq("score" -> "score + 0.5"), col("k") === 1L)
    assert(TxLog.read(spark, path).orderBy("k")
      .select("score").as[Double].collect().toSeq == Seq(1.5, 2.0))
  }

  test("update through outstanding DVs: deleted rows never resurrect into the rewrite") {
    val path = freshPath("underdv")
    TxLog.create((1L to 20L).map(i => (i, i * 1.0)).toDF("k", "score"), path)
    TxLog.deleteWhere(spark, path, col("k") <= 5L, deletionVectors = true)
    TxLog.updateWhere(spark, path, Seq("score" -> "score + 100"), col("k") > 15L)
    val got = TxLog.read(spark, path).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == (6L to 20L),
      "DV-deleted rows must stay gone through the rewrite")
    assert(got.filter(_._1 > 15L).forall(_._2 > 100.0))
    assert(got.filter(r => r._1 >= 6L && r._1 <= 15L).forall(_._2 <= 20.0))
  }
}
