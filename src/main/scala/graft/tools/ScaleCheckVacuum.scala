package graft.tools

import graft.GraftSession
import graft.storage.TxLog

/** Sweep-scale harness for vacuum's distributed orphan enumeration:
  * how long does the dry-run take against 10^4 / 5·10^4 orphans, in
  * driver mode (recursive listing + membership on the driver) versus
  * distributed mode (one task per partition dir, live-set membership
  * as an RDD subtract)?
  *
  * The table is real (one small commit over 32 partitions); the
  * orphans are FABRICATED empty `.parquet` files touched into the
  * partition dirs — the sweep is name-driven, so enumeration is the
  * unit under test, not parquet decoding. Local-FS listings are
  * RAM-speed, so the local ratio understates the win; the claim at
  * 10^6 files on an object store is the PLAN property — the driver
  * never lists a subtree or compares a candidate, it collects only
  * orphans — which the parity assertion (identical sweep sets) pins.
  * Usage: `sbt "runMain graft.tools.ScaleCheckVacuum"`.
  */
object ScaleCheckVacuum {
  private def timeIt(name: String)(f: => Int): Double = {
    val t0 = System.nanoTime()
    val n = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[scalevac] $name%-40s $s%8.2f s  orphans=$n")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalevac")
    import spark.implicits._
    for (n <- Seq(10000, 50000)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_scalevac_$n").toString + "/tbl"
      TxLog.create((0 until 32).map(i => (i.toLong, s"p$i"))
        .toDF("k", "part"), dir, Some("part"))
      // fabricate orphans: name-only empty files inside the live dirs
      val root = java.nio.file.Paths.get(dir, "data")
      (0 until n).foreach { i =>
        java.nio.file.Files.createFile(
          root.resolve(s"part=p${i % 32}").resolve(f"orphan_$i%08d.parquet"))
      }
      spark.conf.set("graft.txlog.distributedIndexThreshold", "100000000")
      var driverSet: Set[String] = Set.empty
      timeIt(s"driver dry-run sweep, $n orphans") {
        driverSet = TxLog.vacuum(spark, dir, dryRun = true).toSet
        driverSet.size
      }
      spark.conf.set("graft.txlog.distributedIndexThreshold", "1")
      var distSet: Set[String] = Set.empty
      timeIt(s"distributed dry-run sweep, $n orphans") {
        distSet = TxLog.vacuum(spark, dir, dryRun = true).toSet
        distSet.size
      }
      require(driverSet == distSet && driverSet.size == n,
        s"sweep parity broken: driver=${driverSet.size} dist=${distSet.size}")
      // and the distributed DELETE pass itself
      timeIt(s"distributed delete sweep, $n orphans") {
        TxLog.vacuum(spark, dir).size
      }
      require(TxLog.vacuum(spark, dir, dryRun = true).isEmpty,
        "sweep left orphans behind")
      require(TxLog.read(spark, dir).count() == 32, "sweep damaged live data")
      spark.conf.unset("graft.txlog.distributedIndexThreshold")
    }
    spark.stop()
  }
}
