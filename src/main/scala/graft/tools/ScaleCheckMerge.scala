package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.TxLog
import graft.tables.Tables

/** Write-economics harness for the merge verbs at sf0.1: a needle
  * merge (10 keys of ~600k rows living in ONE big file) and a sync
  * merge (NOT MATCHED BY SOURCE DELETE over the whole table), each in
  * REWRITE mode versus MERGE-ON-READ (`deletionVectors = true`).
  * Reports wall-clock and BYTES WRITTEN (new data files + DV sidecar,
  * from manifest/_dv sizes — the number that scales to 100 TB: the
  * rewrite's write cost is matched FILES, the DV form's is actioned
  * ROWS). Row-parity between the two modes is asserted, not assumed.
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.ScaleCheckMerge"`. */
object ScaleCheckMerge {
  private def timeIt[T](name: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    (r, s)
  }

  private def bytesUnder(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalemerge")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("k",
        col("l_orderkey") * 10 + col("l_linenumber"))
      .select("k", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in the testdata (the
      // documented gotcha) — dedupe to a true key for the upsert
      .dropDuplicates("k")
      .withColumn("p", lit("all")) // one partition: mergeInto's contract
    val nRows = base.count()
    def fresh(tag: String): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_scalemerge_$tag").toString + "/tbl"
      // ONE big file: the worst case for a rewrite, the best for DVs
      TxLog.create(base.coalesce(1), d, Some("p"), statsCols = Seq("k"))
      d
    }
    val updates = base.filter(col("k") % 60001 === 0)
      .withColumn("l_extendedprice", col("l_extendedprice") * 2)
    val nUpd = updates.count()
    println(s"[scalemerge] corpus $nRows rows, one file; $nUpd needle updates")
    def report(tag: String, path: String, s: Double, before: Long): Unit = {
      val written = bytesUnder(path + "/data") - before +
        bytesUnder(path + "/_dv")
      println(f"[scalemerge] $tag%-34s $s%7.2f s  written=${written / 1024}%8d KiB")
    }
    // needle merge
    val a = fresh("rw"); val aBytes = bytesUnder(a + "/data")
    val (_, sA) = timeIt("rw") { TxLog.mergeInto(a, updates, Seq("k")) }
    report("needle MERGE, rewrite", a, sA, aBytes)
    val b = fresh("dv"); val bBytes = bytesUnder(b + "/data")
    val (_, sB) = timeIt("dv") {
      TxLog.mergeInto(b, updates, Seq("k"), deletionVectors = true) }
    report("needle MERGE, merge-on-read", b, sB, bBytes)
    val ra = TxLog.read(spark, a).agg(sum("l_extendedprice")).head().getDouble(0)
    val rb = TxLog.read(spark, b).agg(sum("l_extendedprice")).head().getDouble(0)
    require(ra == rb && TxLog.read(spark, a).count() == nRows,
      s"mode parity broken: $ra vs $rb")
    // sync merge: source = ~2/3 of rows -> NMS deletes the other third
    // (k's last digit is the linenumber, 1..7 — never 0 — so mod 3)
    val source = base.filter(col("k") % 3 =!= 0)
    val c = fresh("sync_rw"); val cBytes = bytesUnder(c + "/data")
    val (_, sC) = timeIt("sync") {
      TxLog.mergeWhen(c, source, Seq("k"),
        notMatchedBySource = Seq(TxLog.MergeClause(None, "delete")))
    }
    report("sync NMS DELETE, rewrite", c, sC, cBytes)
    val d = fresh("sync_dv"); val dBytes = bytesUnder(d + "/data")
    val (_, sD) = timeIt("syncdv") {
      TxLog.mergeWhen(d, source, Seq("k"),
        notMatchedBySource = Seq(TxLog.MergeClause(None, "delete")),
        deletionVectors = true)
    }
    report("sync NMS DELETE, merge-on-read", d, sD, dBytes)
    val nSrc = source.count()
    val cc = TxLog.read(spark, c).count(); val dc = TxLog.read(spark, d).count()
    require(cc == dc && cc == nSrc,
      s"sync parity broken: $cc vs $dc (source $nSrc)")
    println(s"[scalemerge] sync parity: both modes keep $cc of $nRows rows")
    spark.stop()
  }
}
