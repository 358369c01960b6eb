package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.{CopyInto, TxLog}

/** Scale harness for the r16 COPY INTO rework: the claim is that a
  * RE-RUN's cost is flat as the loaded-file LEDGER grows — the r15
  * implementation collected the whole ledger into a driver Set every
  * run (10^6-10^7 rows at the Common-Crawl scale the operator cites);
  * the rework anti-joins the distributed listing against the ledger
  * TABLE and collects only the fresh tail.
  *
  * The ledger is grown synthetically (appended identities that match
  * no listed file) so the measurement isolates exactly the diff cost:
  * same source dir, same zero-fresh outcome, 10× the ledger.
  *
  * Measured, not asserted — usage:
  * `sbt "runMain graft.tools.ScaleCheckCopy"`. */
object ScaleCheckCopy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalecopy")
    import spark.implicits._

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def rerun(ledgerRows: Long): Double = {
      val root = java.nio.file.Files
        .createTempDirectory(s"scalecopy_$ledgerRows").toString
      val table = s"$root/t"
      val src = s"$root/src"
      TxLog.create(Seq((0L, 0.0)).toDF("k", "v"), table)
      (0 until 5).foreach { i =>
        Seq((i.toLong, i.toDouble)).toDF("k", "v").coalesce(1)
          .write.mode("append").parquet(src)
      }
      CopyInto.copyInto(spark, table, src)
      // grow the ledger with already-loaded identities of files that
      // are not in the listing (ingested from elsewhere, since moved)
      TxLog.append(
        spark.range(0, ledgerRows).select(
          concat(lit("file:/elsewhere/crawl-"), col("id"),
            lit(".parquet")).as("file"),
          col("id").as("size"), col("id").as("mtime")),
        s"$table/_copy_into")
      CopyInto.copyInto(spark, table, src) // warm (JIT + listing cache)
      timed { val (n, _) = CopyInto.copyInto(spark, table, src)
        require(n == 0, s"re-run loaded $n") }
    }

    val r1 = rerun(1000L)
    val r10 = rerun(10000L)
    val r100 = rerun(100000L)
    println(f"[scalecopy] COPY INTO no-op re-run: 10^3-row ledger ${r1}%6.2f s, " +
      f"10^4 ${r10}%6.2f s, 10^5 ${r100}%6.2f s -> ${r10 / r1}%4.1fx / " +
      f"${r100 / r1}%4.1fx at 10x / 100x ledger (expect ~flat: the diff " +
      "is a distributed anti-join, only the fresh tail collects)")
    spark.stop()
  }
}
