package graft.storage

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.tools.Sql

/** The platform pieces COMPOSED, end to end, the way a governed lake
  * actually runs: a constrained table fed by a streaming pipeline,
  * maintained by scoped OPTIMIZE, audited through DESCRIBE HISTORY,
  * replicated through the change feed, and cleaned with a previewed
  * vacuum. Each piece has its own spec; this one pins that they
  * compose — the seams (constraint gate inside the streaming sink,
  * provenance across mixed Scala/SQL writers, CDC after maintenance)
  * are where composition bugs live.
  */
class GovernedLakeE2eSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_lake_$tag"
    val f = new java.io.File(d)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)
    d
  }

  private def rows(path: String): Set[(Long, String, Double)] =
    TxLog.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("governed lake: constrained streaming ingest, scoped maintenance, CDC replica, previewed vacuum — one story") {
    import spark.implicits._
    val src = freshDir("story_src")
    val lake = freshDir("story_lake")
    val replica = freshDir("story_replica")

    // 1. the governed table: partitioned, skip-indexed, constrained
    TxLog.create(Seq((1L, "a", 10.0)).toDF("k", "cat", "v"), lake,
      Some("cat"), statsCols = Seq("k"))
    TxLog.addConstraint(spark, lake, "v_pos", "v > 0")

    // 2. streaming ETL into it: txlog source -> gate transform -> txlog
    // sink; the upstream feed contains a violating row the transform
    // drops, so every delivered micro-batch passes the table's CHECK
    TxLog.create(Seq((2L, "a", 2.0), (90L, "b", -9.0)).toDF("k", "cat", "v"), src)
    val q = spark.readStream.format("graft-txlog").option("path", src).load()
      .filter(col("v") > 0)
      .writeStream.format("graft-txlog").option("path", lake)
      .option("checkpointLocation", freshDir("story_ckpt")).start()
    try {
      q.processAllAvailable()
      TxLog.append(Seq((3L, "b", 3.0), (91L, "a", -1.0)).toDF("k", "cat", "v"), src)
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(lake) == Set((1L, "a", 10.0), (2L, "a", 2.0), (3L, "b", 3.0)),
      s"streamed lake content wrong: ${rows(lake)}")

    // 3. the gate holds against direct writers too — nothing commits
    val vBefore = TxLog.currentVersion(spark, lake).get
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((92L, "a", -5.0)).toDF("k", "cat", "v"), lake)
    }
    assert(TxLog.currentVersion(spark, lake).contains(vBefore))

    // 4. maintenance through SQL: compact ONLY partition a (it holds the
    // create + a streamed batch = 2+ files), z-ordered on k
    Sql.exec(spark, s"TXLOG OPTIMIZE '$lake' PARTITIONS ('a') ZORDER BY k")
    assert(rows(lake) == Set((1L, "a", 10.0), (2L, "a", 2.0), (3L, "b", 3.0)),
      "OPTIMIZE changed content")

    // 5. provenance: the history tells the whole story in order
    val ops = TxLog.history(spark, lake).collect()
      .sortBy(_.getLong(0)).map(_.getString(6)).toSeq
    assert(ops.head == "CREATE" && ops(1) == "ADD CONSTRAINT v_pos", ops.toString)
    assert(ops.count(_ == "STREAMING APPEND") == 2, ops.toString)
    assert(ops.last.startsWith("OPTIMIZE ZORDER BY k"), ops.toString)

    // 6. CDC replica: seed from v1, apply the cumulative change feed —
    // the diff spans streamed commits AND the optimize rewrite
    TxLog.clone(spark, lake, replica, version = Some(1L), deep = true)
    val feed = TxLog.changes(spark, lake, 1L,
      TxLog.currentVersion(spark, lake).get, Seq("k"))
    TxLog.applyChanges(replica, feed, Seq("k"))
    assert(rows(replica) == rows(lake), "replica diverged from primary")

    // 7. previewed cleanup: DRY RUN names exactly what vacuum then
    // frees; the head keeps reading, metadata row counts stay exact
    val preview = Sql.exec(spark, s"TXLOG VACUUM '$lake' RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0)).toSet
    val freed = Sql.exec(spark, s"TXLOG VACUUM '$lake' RETAIN 1 VERSIONS")
      .head().getLong(0)
    assert(freed == preview.size.toLong, s"vacuum freed $freed, preview said ${preview.size}")
    assert(rows(lake).size == 3)
    assert(TxLog.fastCount(spark, lake).contains(3L),
      "metadata count must survive the full story")
  }

  test("the streaming sink inherits the CHECK gate: a violating micro-batch fails the query loudly, nothing commits") {
    import spark.implicits._
    val src = freshDir("gate_src")
    val lake = freshDir("gate_lake")
    TxLog.create(Seq((1L, "a", 1.0)).toDF("k", "cat", "v"), lake, Some("cat"))
    TxLog.addConstraint(spark, lake, "v_pos", "v > 0")
    TxLog.create(Seq((2L, "a", -2.0)).toDF("k", "cat", "v"), src)
    val vBefore = TxLog.currentVersion(spark, lake).get
    val q = spark.readStream.format("graft-txlog").option("path", src).load()
      .writeStream.format("graft-txlog").option("path", lake)
      .option("checkpointLocation", freshDir("gate_ckpt")).start()
    val e = intercept[StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).map(x => x +: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(_.isInstanceOf[TxLog.ConstraintViolationException]),
      s"expected the CHECK violation in the failure chain: $e")
    assert(TxLog.currentVersion(spark, lake).contains(vBefore),
      "a refused micro-batch must not commit")
    assert(rows(lake) == Set((1L, "a", 1.0)))
  }
}
