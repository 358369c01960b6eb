package graft.tools

import org.apache.spark.sql.types.StructType

import graft.GraftSession
import graft.storage.TxLog

/** Cost harness for [[graft.storage.TxLog.mergeRebaseCheck]] — the
  * file-granular OCC admission decision that runs once per LOST
  * version race (never on the happy path). The question at 100 TB:
  * does admitting a rebase against a 10^6-file head cost driver time
  * proportional to the TABLE, or to the CHANGE?
  *
  * Honest answer measured here: the added-file diff is one
  * O(n) set-membership pass over the head's file list (driver-side,
  * no I/O, no Spark job) plus stats votes over the ADDED files only —
  * so the decision is linear in table size with a tiny constant, and
  * strictly cheaper than the alternative it replaces (a
  * CommitConflictException forcing the whole merge to recompute:
  * discovery scan + rewrite, seconds to minutes). The fabricated
  * manifests mirror ScaleCheckIndex's shape; nothing is read.
  */
object ScaleCheckOcc {
  private def entries(n: Int, tag: String = "f"): Seq[String] =
    (0 until n).map(i => f"part=${i % 32}/$tag$i%08d.parquet")

  private def manifestOf(n: Int): TxLog.Manifest = {
    val files = entries(n)
    TxLog.Manifest(1L, Seq("part"), "k BIGINT, part BIGINT", files,
      statsCols = Seq("k"),
      fileStats = files.zipWithIndex.map { case (f, i) =>
        f -> Map("k" -> ((i * 100L).toString, (i * 100L + 99L).toString))
      }.toMap,
      fileRows = files.map(_ -> 100L).toMap)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scaleocc")
    val declared = StructType.fromDDL("k BIGINT, part BIGINT")
    println("[scaleocc] mergeRebaseCheck per-retry decision cost " +
      "(driver-side, no I/O):")
    Seq(10000, 100000, 1000000).foreach { n =>
      val base = manifestOf(n)
      // an interleaved commit: 64 files added at the TOP of the key
      // space (disjoint from the merge's range), 8 DV entries on
      // files the merge never read, 16 unrelated files removed
      val added = entries(64, "new").map(f => f -> Map(
        "k" -> ((n * 100L).toString, (n * 100L + 99L).toString)))
      val latest = base.copy(version = 2L,
        files = base.files.drop(16) ++ added.map(_._1),
        fileStats = base.fileStats ++ added.toMap.view.mapValues(_.map {
          case (c, (lo, hi)) => c -> (lo, hi) }).toMap,
        dv = Seq("d1.dv" -> base.files.takeRight(8).map(_ -> 1L).toMap))
      // the merge read/touches 32 mid-range files, keys [1600, 4799]
      val touched = base.files.slice(16, 48).toSet
      val chk = TxLog.mergeRebaseCheck(declared,
        Some(("k", "1600", "4799")), sourceEmpty = false, touched, touched,
        "UTC")
      // warm once (classloading), then min-of-5
      chk(base, latest)
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val verdict = chk(base, latest)
        require(verdict.isEmpty,
          s"disjoint interleave must be admitted, got $verdict")
        (System.nanoTime() - t0) / 1e6
      }
      // and the conflict side: an added file INSIDE the merged range
      val hot = latest.copy(files = latest.files :+ "part=0/hot.parquet",
        fileStats = latest.fileStats +
          ("part=0/hot.parquet" -> Map("k" -> ("2000", "2050"))))
      require(chk(base, hot).isDefined, "overlapping add must conflict")
      println(f"[scaleocc] n=$n%8d  admit min=${times.min}%8.2f ms  " +
        f"max=${times.max}%8.2f ms")
    }
    spark.stop()
  }
}
