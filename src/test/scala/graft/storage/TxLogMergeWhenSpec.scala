package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.storage.TxLog.MergeClause

/** The full conditional MERGE — `mergeWhen` (Delta/SQL:2003 grammar):
  * WHEN MATCHED [AND] UPDATE/DELETE, WHEN NOT MATCHED INSERT *, WHEN
  * NOT MATCHED BY SOURCE DELETE. Clause conditions and SET expressions
  * see the target row's columns plus the source row as a struct named
  * `src`. Without an NMS clause the rewrite set stays FILE-granular
  * (only files holding a matched key move); with one, the whole table
  * rewrites in the same single commit.
  */
class TxLogMergeWhenSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mw_$tag").toString + "/tbl"

  private def seed(path: String): Unit =
    TxLog.create(Seq(
      (1L, "open", 10.0), (2L, "open", 20.0), (3L, "open", 30.0),
      (4L, "hold", 40.0)).toDF("k", "status", "amt"), path)

  test("full grammar: conditional update, conditional delete, insert, carry") {
    val path = freshPath("full")
    seed(path)
    // source: k=1 (higher amt -> update), k=2 (negative amt -> delete),
    // k=3 (LOWER amt -> matches neither condition -> carry), k=9 (new -> insert)
    val src = Seq((1L, "upd", 15.0), (2L, "upd", -1.0),
      (3L, "upd", 5.0), (9L, "new", 90.0)).toDF("k", "status", "amt")
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(
        MergeClause(Some("src.amt < 0"), "delete"),
        MergeClause(Some("src.amt > amt"), "update",
          Seq("amt" -> "src.amt", "status" -> "src.status"))),
      notMatched = Seq(MergeClause(None, "insert")))
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "upd", 15.0),   // updated (src.amt > amt)
      (3L, "open", 30.0),  // matched, no clause true: carried
      (4L, "hold", 40.0),  // unmatched target, no NMS: carried
      (9L, "new", 90.0)))  // inserted
  }

  test("first-true clause wins: order between overlapping matched clauses is honored") {
    val path = freshPath("order")
    seed(path)
    val src = Seq((1L, "x", 99.0)).toDF("k", "status", "amt")
    // both clauses' conditions hold for k=1; the FIRST (delete) wins
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(
        MergeClause(Some("src.amt > 0"), "delete"),
        MergeClause(None, "update", Seq("amt" -> "src.amt"))))
    assert(TxLog.read(spark, path).filter(col("k") === 1L).count() == 0)
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("NOT MATCHED BY SOURCE: the sync shape makes target mirror source") {
    val path = freshPath("nms")
    seed(path)
    val src = Seq((1L, "keep", 11.0), (9L, "new", 90.0))
      .toDF("k", "status", "amt")
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(MergeClause(None, "update",
        Seq("status" -> "src.status", "amt" -> "src.amt"))),
      notMatched = Seq(MergeClause(None, "insert")),
      notMatchedBySource = Seq(MergeClause(None, "delete")))
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "keep", 11.0), (9L, "new", 90.0)),
      s"target must mirror source exactly, got $out")
    // conditional NMS: only delete unmatched rows the condition names
    val path2 = freshPath("nms_cond")
    seed(path2)
    TxLog.mergeWhen(path2, Seq((1L, "s", 1.0)).toDF("k", "status", "amt"),
      Seq("k"),
      notMatchedBySource = Seq(MergeClause(Some("status = 'hold'"), "delete")))
    assert(TxLog.read(spark, path2).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L), "only the 'hold' unmatched row deletes")
  }

  test("file economics: without NMS only files holding matched keys rewrite") {
    val path = freshPath("econ")
    // two partitions; matched key lives in p=a only
    TxLog.create(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "p", "amt"), path, Some("p"))
    val before = TxLog.manifest(spark, path, 1L).files
    val bFiles = before.filter(_.startsWith("p=b/")).toSet
    TxLog.mergeWhen(path, Seq((1L, "a", 9.0)).toDF("k", "p", "amt"),
      Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))))
    val after = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).files
    assert(after.filter(_.startsWith("p=b/")).toSet == bFiles,
      "untouched partition's files must carry by reference")
    assert(TxLog.read(spark, path).filter(col("k") === 1L)
      .select("amt").as[Double].head() == 9.0)
  }

  test("insert-only merge rewrites nothing and never duplicates an existing key") {
    val path = freshPath("insonly")
    seed(path)
    val before = TxLog.manifest(spark, path, 1L).files.toSet
    // k=1 exists (must NOT insert), k=7 is new
    TxLog.mergeWhen(path, Seq((1L, "dup", 1.0), (7L, "new", 70.0))
      .toDF("k", "status", "amt"), Seq("k"),
      notMatched = Seq(MergeClause(None, "insert")))
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(before.subsetOf(m.files.toSet),
      "insert-only merge must carry every existing file by reference")
    val out = TxLog.read(spark, path)
    assert(out.count() == 5)
    assert(out.filter(col("k") === 1L).count() == 1, "no duplicate for k=1")
    assert(out.filter(col("k") === 7L).select("amt").as[Double].head() == 70.0)
  }

  test("DV-deleted rows stay deleted through the rewrite") {
    val path = freshPath("dv")
    seed(path)
    TxLog.deleteWhere(spark, path, col("k") === 2L, deletionVectors = true)
    TxLog.mergeWhen(path, Seq((2L, "ghost", 99.0)).toDF("k", "status", "amt"),
      Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))),
      notMatched = Seq(MergeClause(None, "insert")))
    // k=2 was DV-deleted: it is NOT matched -> it INSERTS as a new row
    val out = TxLog.read(spark, path).filter(col("k") === 2L)
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((2L, "ghost", 99.0)),
      s"DV-deleted row must not resurrect its old version, got $out")
  }

  test("DV mode: same dispositions, zero file rewrites, delete-sized sidecar") {
    val path = freshPath("dvmode")
    seed(path)
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    val src = Seq((1L, "upd", 15.0), (2L, "upd", -1.0),
      (3L, "upd", 5.0), (9L, "new", 90.0)).toDF("k", "status", "amt")
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(
        MergeClause(Some("src.amt < 0"), "delete"),
        MergeClause(Some("src.amt > amt"), "update",
          Seq("amt" -> "src.amt", "status" -> "src.status"))),
      notMatched = Seq(MergeClause(None, "insert")),
      deletionVectors = true)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(filesBefore.subsetOf(m.files.toSet),
      "DV merge must carry every original file by reference")
    assert(m.dv.nonEmpty, "the actioned rows must land as a DV sidecar")
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "upd", 15.0), (3L, "open", 30.0),
      (4L, "hold", 40.0), (9L, "new", 90.0)),
      s"DV-mode dispositions diverged: $out")
  }

  test("DV mode NMS: the sync shape without the whole-table rewrite") {
    val path = freshPath("dvnms")
    seed(path)
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    TxLog.mergeWhen(path,
      Seq((1L, "keep", 11.0), (9L, "new", 90.0)).toDF("k", "status", "amt"),
      Seq("k"),
      matched = Seq(MergeClause(None, "update",
        Seq("status" -> "src.status", "amt" -> "src.amt"))),
      notMatched = Seq(MergeClause(None, "insert")),
      notMatchedBySource = Seq(MergeClause(None, "delete")),
      deletionVectors = true)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(filesBefore.subsetOf(m.files.toSet),
      "NMS under DV mode must not rewrite the table")
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "keep", 11.0), (9L, "new", 90.0)), s"got $out")
    // rewrite-mode parity on a fresh copy: identical result
    val path2 = freshPath("dvnms_rw")
    seed(path2)
    TxLog.mergeWhen(path2,
      Seq((1L, "keep", 11.0), (9L, "new", 90.0)).toDF("k", "status", "amt"),
      Seq("k"),
      matched = Seq(MergeClause(None, "update",
        Seq("status" -> "src.status", "amt" -> "src.amt"))),
      notMatched = Seq(MergeClause(None, "insert")),
      notMatchedBySource = Seq(MergeClause(None, "delete")))
    assert(TxLog.read(spark, path2).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == out,
      "rewrite and DV modes must read identically")
  }

  test("SQL verb: USING DELETION VECTORS suffix routes to the DV engine") {
    val path = freshPath("dvsql")
    seed(path)
    val filesBefore = TxLog.manifest(spark, path, 1L).files.toSet
    Seq((2L, "s", 99.0)).toDF("k", "status", "amt")
      .createOrReplaceTempView("mw_dvsrc")
    graft.tools.Sql.exec(spark,
      s"""TXLOG MERGE INTO '$path' ON k USING (SELECT * FROM mw_dvsrc)
         |WHEN MATCHED THEN UPDATE SET amt = src.amt
         |USING DELETION VECTORS""".stripMargin)
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(filesBefore.subsetOf(m.files.toSet) && m.dv.nonEmpty)
    assert(TxLog.read(spark, path).filter(col("k") === 2L)
      .select("amt").as[Double].head() == 99.0)
  }

  test("refusals: duplicate source keys, layout SET, unknown SET, partial INSERT source") {
    val path = freshPath("refuse")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "p", "amt"), path, Some("p"))
    intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, Seq((1L, "a", 1.0), (1L, "a", 2.0))
        .toDF("k", "p", "amt"), Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))))
    }
    intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, Seq((1L, "b", 1.0)).toDF("k", "p", "amt"),
        Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("p" -> "src.p"))))
    }
    intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, Seq((1L, "a", 1.0)).toDF("k", "p", "amt"),
        Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("nope" -> "1"))))
    }
    intercept[IllegalArgumentException] { // INSERT * needs every column
      TxLog.mergeWhen(path, Seq((9L, "a")).toDF("k", "p"), Seq("k"),
        notMatched = Seq(MergeClause(None, "insert")))
    }
    intercept[IllegalArgumentException] { // no clauses
      TxLog.mergeWhen(path, Seq((1L, "a", 1.0)).toDF("k", "p", "amt"),
        Seq("k"))
    }
  }

  test("conditional merge through a RENAME: clauses address the logical name") {
    val path = freshPath("renamed")
    seed(path)
    TxLog.renameColumn(spark, path, "amt", "amount")
    TxLog.mergeWhen(path,
      Seq((1L, "s", 15.0), (9L, "s", 90.0)).toDF("k", "status", "amount"),
      Seq("k"),
      matched = Seq(MergeClause(Some("src.amount > amount"), "update",
        Seq("amount" -> "src.amount"))),
      notMatched = Seq(MergeClause(None, "insert")))
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "open", 15.0), (2L, "open", 20.0),
      (3L, "open", 30.0), (4L, "hold", 40.0), (9L, "s", 90.0)),
      s"renamed-table merge diverged: $out")
    // the files still spell the PHYSICAL name — the logical is a view
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.colMap.exists { case (l, p) => l == "amount" && p == "amt" })
  }

  test("conditional merge on a HIDDEN-partitioned table restages through the derived layout") {
    val path = freshPath("hidden")
    TxLog.create(Seq((1L, 10.0), (2L, 20.0), (17L, 30.0)).toDF("k", "amt")
      .coalesce(1), path, hiddenPartitions = Seq("bucket(4, k)"))
    TxLog.mergeWhen(path,
      Seq((1L, 11.0), (9L, 90.0)).toDF("k", "amt"), Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))),
      notMatched = Seq(MergeClause(None, "insert")))
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 11.0), (2L, 20.0), (9L, 90.0), (17L, 30.0)),
      s"hidden-table merge diverged: $out")
    // rewritten and inserted rows landed in derived bucket dirs
    val m = TxLog.manifest(spark, path, TxLog.currentVersion(spark, path).get)
    assert(m.files.forall(_.startsWith("_bucket_k=")), m.files.mkString(","))
    // SET on the transform source refuses (the layout key's type and
    // value derive the directory)
    intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, Seq((1L, 0.0)).toDF("k", "amt"), Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("k" -> "src.k"))))
    }
  }

  test("CHECK constraints re-vet the written rows") {
    val path = freshPath("check")
    seed(path)
    TxLog.addConstraint(spark, path, "amt_pos", "amt >= 0")
    intercept[TxLog.ConstraintViolationException] {
      TxLog.mergeWhen(path, Seq((1L, "bad", 5.0)).toDF("k", "status", "amt"),
        Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("amt" -> "-src.amt"))))
    }
    assert(TxLog.read(spark, path).filter(col("k") === 1L)
      .select("amt").as[Double].head() == 10.0, "refused merge changed nothing")
  }

  test("SQL verb: multi-clause MERGE parses and runs; the plain upsert form still dispatches") {
    val path = freshPath("sql")
    seed(path)
    spark.sql("SELECT 1").collect() // session warm
    Seq((1L, "s", 15.0), (2L, "s", -1.0), (9L, "s", 90.0))
      .toDF("k", "status", "amt").createOrReplaceTempView("mw_src")
    graft.tools.Sql.exec(spark,
      s"""TXLOG MERGE INTO '$path' ON k USING (SELECT * FROM mw_src)
         |WHEN MATCHED AND src.amt < 0 THEN DELETE
         |WHEN MATCHED AND src.amt > amt THEN UPDATE SET amt = src.amt, status = src.status
         |WHEN NOT MATCHED THEN INSERT
         |WHEN NOT MATCHED BY SOURCE AND status = 'hold' THEN DELETE""".stripMargin)
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "s", 15.0), (3L, "open", 30.0), (9L, "s", 90.0)),
      s"got $out")
    // the legacy upsert form still routes to mergeInto — needs a
    // partitioned table (its contract)
    val path2 = freshPath("sql_plain")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "p", "amt"), path2, Some("p"))
    Seq((1L, "a", 5.0)).toDF("k", "p", "amt")
      .createOrReplaceTempView("mw_src2")
    graft.tools.Sql.exec(spark,
      s"TXLOG MERGE INTO '$path2' ON k USING SELECT * FROM mw_src2")
    assert(TxLog.read(spark, path2).select("amt").as[Double].head() == 5.0)
  }

  test("declared UNIQUE constraints bind on mergeWhen's written rows") {
    // one file, so the rewrite scope carries every row and the
    // within-batch gate sees the collision (the uncovered-file case
    // remains the warned trade, same as mergeInto)
    val path = freshPath("uniq")
    TxLog.create(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "status", "u").coalesce(1), path)
    TxLog.addUniqueConstraint(spark, path, "u_uq", Seq("u"))
    // an UPDATE SET on the unique column colliding with a carried row
    intercept[TxLog.ConstraintViolationException] {
      TxLog.mergeWhen(path, Seq((1L, "x", 20L)).toDF("k", "status", "u"),
        Seq("k"), matched = Seq(MergeClause(None, "update",
          Seq("u" -> "src.u"))))
    }
    // a WHEN NOT MATCHED INSERT duplicating a carried row's unique key
    intercept[TxLog.ConstraintViolationException] {
      TxLog.mergeWhen(path,
        Seq((1L, "x", 10L), (3L, "c", 20L)).toDF("k", "status", "u"),
        Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("status" -> "src.status"))),
        notMatched = Seq(MergeClause(None, "insert")))
    }
    // nothing committed, table unchanged
    assert(TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L)))
    // a non-colliding merge still lands
    TxLog.mergeWhen(path, Seq((3L, "c", 30L)).toDF("k", "status", "u"),
      Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("u" -> "src.u"))),
      notMatched = Seq(MergeClause(None, "insert")))
    assert(TxLog.read(spark, path).count() == 3)
  }

  test("USING subqueries and clauses may contain CASE ... WHEN/THEN") {
    val path = freshPath("sqlcase")
    seed(path)
    TxLog.read(spark, path) // warm
    Seq((1L, 99.0), (9L, 90.0)).toDF("k", "amt0")
      .createOrReplaceTempView("mw_case_src")
    // searched CASE in the subquery projection, simple CASE in a
    // clause condition, searched CASE in a SET expression — each
    // contains WHEN/THEN/END tokens the lazy-regex split tripped over
    graft.tools.Sql.exec(spark,
      s"TXLOG MERGE INTO '$path' ON k USING (" +
        "SELECT k, CASE WHEN amt0 > 50 THEN 'big' ELSE 'small' END AS status, " +
        "amt0 AS amt FROM mw_case_src) " +
        "WHEN MATCHED AND CASE (k) WHEN 1 THEN true ELSE false END " +
        "THEN UPDATE SET amt = src.amt, " +
        "status = CASE WHEN src.amt > amt THEN 'raised' ELSE 'lowered' END " +
        "WHEN NOT MATCHED THEN INSERT")
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "raised", 99.0), // simple-CASE condition true, searched-CASE SET
      (2L, "open", 20.0), (3L, "open", 30.0), (4L, "hold", 40.0),
      (9L, "big", 90.0)),   // inserted with the subquery's CASE projection
      s"got $out")
  }

  test("evolveSchema: UPDATE SET on a new column, INSERT * lands it whole") {
    val path = freshPath("evolve")
    seed(path) // v1: (k, status, amt)
    val src = Seq((1L, "upd", 15.0, "gold"), (9L, "new", 90.0, "silver"))
      .toDF("k", "status", "amt", "tier")
    // without the flag the extra column refuses loudly — nothing commits
    val e = intercept[IllegalArgumentException] {
      TxLog.mergeWhen(path, src, Seq("k"),
        matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))),
        notMatched = Seq(MergeClause(None, "insert")))
    }
    assert(e.getMessage.contains("evolveSchema"))
    assert(TxLog.currentVersion(spark, path).contains(1L))
    // with it: ONE commit widens the schema, SET may assign the new
    // column, INSERT * lands it whole, untouched rows read null
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(MergeClause(None, "update",
        Seq("amt" -> "src.amt", "tier" -> "src.tier"))),
      notMatched = Seq(MergeClause(None, "insert")),
      evolveSchema = true)
    assert(TxLog.currentVersion(spark, path).contains(2L))
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, "open", 15.0, Some("gold")),  // updated; SET names the new col
      (2L, "open", 20.0, None),          // untouched: new col reads null
      (3L, "open", 30.0, None),
      (4L, "hold", 40.0, None),
      (9L, "new", 90.0, Some("silver"))), s"got $out")
    // version-pinned read of v1 keeps the PRE-evolution schema
    assert(TxLog.read(spark, path, Some(1L)).columns.toSeq ==
      Seq("k", "status", "amt"))
  }

  test("SQL verbs: WITH SCHEMA EVOLUTION suffix on both MERGE grammars") {
    import spark.implicits._
    // conditional grammar, suffix AFTER the WHEN clauses
    val path = freshPath("sqlev")
    seed(path)
    Seq((1L, "u", 11.0, "gold"), (9L, "n", 90.0, "silver"))
      .toDF("k", "status", "amt", "tier")
      .createOrReplaceTempView("mw_ev_src")
    graft.tools.Sql.exec(spark,
      s"TXLOG MERGE INTO '$path' ON k USING " +
        "(SELECT * FROM mw_ev_src) " +
        "WHEN MATCHED THEN UPDATE SET amt = src.amt, tier = src.tier " +
        "WHEN NOT MATCHED THEN INSERT " +
        "WITH SCHEMA EVOLUTION")
    val out = TxLog.read(spark, path).orderBy("k")
      .select("k", "tier").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, Some("gold")), (2L, None), (3L, None),
      (4L, None), (9L, Some("silver"))), s"got $out")
    // plain upsert grammar (partitioned table — mergeInto's contract)
    val path2 = freshPath("sqlev2")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "p", "amt"), path2, Some("p"))
    Seq((1L, "a", 2.0, 7), (2L, "a", 3.0, 8))
      .toDF("k", "p", "amt", "rank").createOrReplaceTempView("mw_ev_src2")
    graft.tools.Sql.exec(spark,
      s"TXLOG MERGE INTO '$path2' ON k USING " +
        "SELECT * FROM mw_ev_src2 WITH SCHEMA EVOLUTION")
    val out2 = TxLog.read(spark, path2).orderBy("k")
      .select("k", "rank").as[(Long, Option[Int])].collect().toSeq
    assert(out2 == Seq((1L, Some(7)), (2L, Some(8))), s"got $out2")
    // APPEND grammar, same suffix
    graft.tools.Sql.exec(spark,
      s"TXLOG APPEND INTO '$path2' SELECT CAST(3 AS BIGINT) AS k, " +
        "'a' AS p, CAST(9.0 AS DOUBLE) AS amt, 1 AS rank, " +
        "'x' AS note WITH SCHEMA EVOLUTION")
    assert(TxLog.read(spark, path2).columns.contains("note"))
    assert(TxLog.read(spark, path2).count() == 3)
  }

  test("evolveSchema: a merge whose clauses all no-op still widens") {
    val path = freshPath("evnoop")
    seed(path)
    // source keys hit nothing, no INSERT clause: the data no-ops, but
    // the schema widening must still commit (and seal the txn lane)
    val src = Seq((99L, "x", 1.0, "gold")).toDF("k", "status", "amt", "tier")
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))),
      txn = Some("cdc" -> 7L), evolveSchema = true)
    assert(TxLog.read(spark, path).columns.contains("tier"),
      "a no-op evolution merge must still widen the schema")
    assert(TxLog.read(spark, path).count() == 4)
    // the txn lane sealed with the widen: a replay skips whole
    val v = TxLog.currentVersion(spark, path).get
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(MergeClause(None, "update", Seq("amt" -> "src.amt"))),
      txn = Some("cdc" -> 7L), evolveSchema = true)
    assert(TxLog.currentVersion(spark, path).contains(v), "replay must skip")
  }

  test("evolveSchema in DV mode: widened commit, zero file rewrites") {
    val path = freshPath("evolvedv")
    seed(path)
    val before = TxLog.manifest(spark, path, 1L).files.toSet
    val src = Seq((2L, "upd", 25.0, 7), (8L, "new", 80.0, 8))
      .toDF("k", "status", "amt", "rank")
    TxLog.mergeWhen(path, src, Seq("k"),
      matched = Seq(MergeClause(None, "update",
        Seq("amt" -> "src.amt", "rank" -> "src.rank"))),
      notMatched = Seq(MergeClause(None, "insert")),
      deletionVectors = true, evolveSchema = true)
    val out = TxLog.read(spark, path).orderBy("k")
      .as[(Long, String, Double, Option[Int])].collect().toSeq
    assert(out == Seq(
      (1L, "open", 10.0, None), (2L, "open", 25.0, Some(7)),
      (3L, "open", 30.0, None), (4L, "hold", 40.0, None),
      (8L, "new", 80.0, Some(8))), s"got $out")
    // merge-on-read: every pre-merge file survives (DV + appends only)
    val after = TxLog.manifest(spark, path,
      TxLog.currentVersion(spark, path).get).files.toSet
    assert(before.subsetOf(after))
  }
}
