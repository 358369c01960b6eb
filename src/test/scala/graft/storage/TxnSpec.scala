package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table transactions: journaled saga with reverse
  * compensation. Atomic OUTCOME (all tables commit, or every
  * committed one restores to its pre-transaction head), crash
  * recovery from the intent journal, and a loud refusal to roll back
  * over an interleaved writer's commit.
  */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txn_$tag").toString

  test("happy path: every op commits, the journal clears") {
    val root = freshRoot("ok")
    val t1 = s"$root/t1"; val t2 = s"$root/t2"
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), t1)
    TxLog.create(Seq((1L, 10.0)).toDF("k", "score"), t2)
    val versions = Txn.transact(spark, root, Seq(
      Txn.Append(t1, Seq((2L, "b")).toDF("k", "v")),
      Txn.Update(t2, Seq("score" -> "score + 1"), col("k") === 1L)))
    assert(versions == Seq(2L, 2L))
    assert(TxLog.read(spark, t1).count() == 2)
    assert(TxLog.read(spark, t2).select("score").as[Double].head() == 11.0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, "_txn")
    assert(!fs.exists(dir) || fs.listStatus(dir).isEmpty,
      "a committed transaction leaves no journal")
  }

  test("conditional merge inside a transaction: sync + append land or compensate together") {
    val root = freshRoot("mw")
    val t1 = s"$root/t1"; val t2 = s"$root/t2"
    TxLog.create(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"), t1)
    TxLog.create(Seq((1L, "log")).toDF("k", "note"), t2)
    val versions = Txn.transact(spark, root, Seq(
      Txn.MergeWhen(t1, Seq((1L, 11.0), (9L, 90.0)).toDF("k", "amt"),
        Seq("k"),
        matched = Seq(TxLog.MergeClause(None, "update", Seq("amt" -> "src.amt"))),
        notMatched = Seq(TxLog.MergeClause(None, "insert")),
        notMatchedBySource = Seq(TxLog.MergeClause(None, "delete"))),
      Txn.Append(t2, Seq((2L, "synced")).toDF("k", "note"))))
    assert(versions == Seq(2L, 2L))
    assert(TxLog.read(spark, t1).orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 11.0), (9L, 90.0)))
    assert(TxLog.read(spark, t2).count() == 2)
    // failing second op compensates the landed merge
    intercept[Txn.TxnFailedException] {
      Txn.transact(spark, root, Seq(
        Txn.MergeWhen(t1, Seq((1L, 99.0)).toDF("k", "amt"), Seq("k"),
          matched = Seq(TxLog.MergeClause(None, "update",
            Seq("amt" -> "src.amt")))),
        Txn.Append(t2, Seq((3L, "x")).toDF("k", "WRONG_COL"))))
    }
    assert(TxLog.read(spark, t1).filter(col("k") === 1L)
      .select("amt").as[Double].head() == 11.0,
      "the compensated merge must roll back")
  }

  test("failure compensates: the committed table restores to its pre-txn head") {
    val root = freshRoot("comp")
    val t1 = s"$root/t1"; val t2 = s"$root/t2"
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), t1)
    TxLog.create(Seq((1L, 10.0)).toDF("k", "score"), t2)
    TxLog.addConstraint(spark, t2, "pos", "score >= 0")
    val e = intercept[Txn.TxnFailedException] {
      Txn.transact(spark, root, Seq(
        Txn.Append(t1, Seq((2L, "b")).toDF("k", "v")),          // commits
        Txn.Update(t2, Seq("score" -> "-5.0"), col("k") === 1L) // CHECK fails
      ))
    }
    assert(e.getMessage.contains(t1), s"report must name the restored table: $e")
    // t1 is back to its pre-transaction state (a restore ref on top)
    assert(TxLog.read(spark, t1).count() == 1,
      "the committed append must compensate away")
    assert(TxLog.read(spark, t2).select("score").as[Double].head() == 10.0)
    // compensation complete: journal gone
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, "_txn")
    assert(!fs.exists(dir) || fs.listStatus(dir).isEmpty)
  }

  test("an appendOnly table inside a failing txn still compensates: own-commit rollback bypasses the gate") {
    val root = freshRoot("comp_ao")
    val t1 = s"$root/t1"; val t2 = s"$root/t2"
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), t1)
    TxLog.setProperties(spark, t1, Map(TxLog.AppendOnlyProp -> "true"))
    TxLog.create(Seq((1L, 10.0)).toDF("k", "score"), t2)
    TxLog.addConstraint(spark, t2, "pos", "score >= 0")
    intercept[Txn.TxnFailedException] {
      Txn.transact(spark, root, Seq(
        Txn.Append(t1, Seq((2L, "b")).toDF("k", "v")),          // commits
        Txn.Update(t2, Seq("score" -> "-5.0"), col("k") === 1L) // CHECK fails
      ))
    }
    assert(TxLog.read(spark, t1).count() == 1,
      "rollback of the txn's OWN incomplete append must not be refused")
    assert(TxLog.isAppendOnly(TxLog.manifest(spark, t1,
      TxLog.currentVersion(spark, t1).get)),
      "the restore lands back on the protected definition")
    // a direct user restore on the same table still refuses
    val e = intercept[UnsupportedOperationException] {
      TxLog.restore(spark, t1, 1L)
    }
    assert(e.getMessage.contains(TxLog.AppendOnlyProp))
    // compensation completed: journal gone
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, "_txn")
    assert(!fs.exists(dir) || fs.listStatus(dir).isEmpty)
  }

  test("crash recovery: an orphaned journal compensates on recover()") {
    val root = freshRoot("recover")
    val t1 = s"$root/t1"
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), t1)             // v1
    // simulate: a transaction committed v2 on t1 then crashed before
    // finishing — its journal survives, its head is still v2
    val v2 = TxLog.append(Seq((2L, "b")).toDF("k", "v"), t1)
    assert(v2 == 2L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_txn"))
    val journal =
      s"""{"id": "deadbeef", "ts": 1, "entries": [
         |  {"path": "$t1", "headBefore": 1, "committed": 2}
         |]}""".stripMargin
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_txn/deadbeef.json"), true)
    out.write(journal.getBytes("UTF-8")); out.close()
    val report = Txn.recover(spark, root).collect()
    assert(report.length == 1)
    assert(report.head.getAs[scala.collection.Seq[String]]("restored").toSeq == Seq(t1))
    assert(report.head.getAs[scala.collection.Seq[String]]("conflicted").isEmpty)
    TxLog.flushSnapshotCacheForTesting()
    assert(TxLog.read(spark, t1).count() == 1, "recover must restore t1 to v1")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root, "_txn")).isEmpty,
      "a fully-compensated journal deletes")
  }

  test("interleaved writer: compensation refuses, reports, keeps the journal") {
    val root = freshRoot("conflict")
    val t1 = s"$root/t1"
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), t1)             // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t1)             // v2 "the txn's"
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t1)             // v3 interleaved!
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_txn"))
    val journal =
      s"""{"id": "cafebabe", "ts": 1, "entries": [
         |  {"path": "$t1", "headBefore": 1, "committed": 2}
         |]}""".stripMargin
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_txn/cafebabe.json"), true)
    out.write(journal.getBytes("UTF-8")); out.close()
    val report = Txn.recover(spark, root).collect()
    assert(report.head.getAs[scala.collection.Seq[String]]("conflicted").toSeq == Seq(t1),
      "a moved head must refuse rollback")
    assert(TxLog.read(spark, t1).count() == 3,
      "the interleaved commit must survive untouched")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root, "_txn")).nonEmpty,
      "a conflicted journal stays for inspection")
  }

  test("the journal blind spot: committed-but-unjournaled heads report indeterminate") {
    val root = freshRoot("blind")
    val t1 = s"$root/t1"
    TxLog.create(Seq((1L, "a")).toDF("k", "v"), t1)             // v1
    // a crash BETWEEN t1's commit and the journal republish: the head
    // moved (v2) but the journal never recorded a committed version —
    // the mover could equally be an interleaved writer
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t1)             // v2
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_txn"))
    val journal =
      s"""{"id": "feedf00d", "ts": 1, "entries": [
         |  {"path": "$t1", "headBefore": 1}
         |]}""".stripMargin
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_txn/feedf00d.json"), true)
    out.write(journal.getBytes("UTF-8")); out.close()
    val report = Txn.recover(spark, root).collect()
    assert(report.head.getAs[scala.collection.Seq[String]]("indeterminate").toSeq ==
      Seq(t1), "a moved head with no recorded commit must report indeterminate")
    assert(TxLog.read(spark, t1).count() == 2, "recovery must touch nothing")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(root, "_txn")).nonEmpty,
      "an indeterminate journal stays for inspection")
  }

  test("name-addressed form: catalog names resolve, the warehouse is the journal root") {
    val wh = freshRoot("catalog")
    val old = spark.conf.getOption("graft.catalog.warehouse")
    try {
      spark.conf.set("graft.catalog.warehouse", wh)
      Catalog.create(spark, "facts", Seq((1L, 1.0)).toDF("k", "v"))
      Catalog.create(spark, "dims", Seq((1L, "a")).toDF("k", "name"))
      val versions = Txn.transact(spark, Seq(
        Txn.Append("facts", Seq((2L, 2.0)).toDF("k", "v")),
        Txn.Append("dims", Seq((2L, "b")).toDF("k", "name"))))
      assert(versions == Seq(2L, 2L))
      assert(Catalog.table(spark, "facts").count() == 2)
      assert(Catalog.table(spark, "dims").count() == 2)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)
      val dir = new org.apache.hadoop.fs.Path(wh, "_txn")
      assert(!fs.exists(dir) || fs.listStatus(dir).isEmpty)
    } finally {
      old match {
        case Some(s) => spark.conf.set("graft.catalog.warehouse", s)
        case None => spark.conf.unset("graft.catalog.warehouse")
      }
    }
  }
}
