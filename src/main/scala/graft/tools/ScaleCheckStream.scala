package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.TxLog

/** Scale evidence for the metadata-poll and streaming-tail paths:
  *
  *  1. `currentVersion` at a deep version history — the streaming
  *     source polls it EVERY trigger, so its cost is the floor of
  *     stream latency. With the `_head` hint it is one small read +
  *     a forward probe (version-count-invariant); the measured
  *     fallback (hint deleted) lists the whole `_manifests` dir,
  *     O(versions) per poll. The gap is the point of the hint.
  *
  *  2. Streaming catch-up cost must track files CHANGED per commit,
  *     never table size: a 20-commit backlog drains through the
  *     graft-txlog source on a 16-file and a 1024-file table; the
  *     wall-clock per drained commit should be flat across the two
  *     (the tail batches plan each commit's added files from the
  *     manifest diff — the 64x bigger table never gets re-read).
  */
object ScaleCheckStream {

  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scale-stream] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def rmrf(d: String): Unit = {
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    rm(new java.io.File(d))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scale-stream")
    import spark.implicits._
    val root = "/tmp/graft_scalestream"
    rmrf(root)

    // ---- 1. head-hint vs listing at 120 versions ----
    val hp = s"$root/head"
    TxLog.create(Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), hp, Some("part"))
    time("build 120-version history") {
      (1 to 120).foreach(i =>
        TxLog.append(Seq((i.toLong, s"p${i % 8}", i.toDouble)).toDF("k", "part", "v"), hp))
    }
    val polls = 2000
    time(s"currentVersion x$polls WITH _head hint") {
      (1 to polls).foreach(_ => TxLog.currentVersion(spark, hp))
    }
    new java.io.File(s"$hp/_manifests/_head").delete()
    time(s"currentVersion x$polls LISTING fallback") {
      (1 to polls).foreach(_ => TxLog.currentVersion(spark, hp))
    }

    // ---- 2. streaming catch-up: 16-file vs 1024-file table ----
    def build(tag: String, files: Int): String = {
      val p = s"$root/tail_$tag"
      val base = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.1")
        .select(col("l_orderkey").as("k"), col("l_quantity").as("v"))
        .repartition(files)
      val v0 = TxLog.create(base, p)
      require(v0 == 1L)
      // the backlog: 20 one-file commits
      (1 to 20).foreach(i =>
        TxLog.append(Seq((i.toLong * 1000000000L, i.toDouble)).toDF("k", "v")
          .coalesce(1), p))
      p
    }
    def drain(tag: String, p: String): Unit = {
      var rows = 0L
      val q = spark.readStream.format("graft-txlog")
        .option("path", p)
        .option("sinceVersion", "1") // tail the 20-commit backlog only
        .option("maxVersionsPerBatch", "1")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          rows += df.count(); ()
        }.start()
      try {
        time(s"drain 20-commit backlog, $tag table") {
          q.processAllAvailable()
        }
        require(rows == 20L, s"$tag: expected 20 backlog rows, got $rows")
      } finally q.stop()
    }
    val small = time("build 16-file table + backlog")(build("16-file", 16))
    val big = time("build 1024-file table + backlog")(build("1024-file", 1024))
    drain("16-file", small)
    drain("1024-file", big)
    spark.stop()
  }
}
