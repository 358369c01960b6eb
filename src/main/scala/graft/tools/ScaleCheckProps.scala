package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.TxLog

/** Scale harness for the r15 DECLARED-maintenance properties: the
  * claims are that a data commit's follow-on work tracks the COMMIT,
  * not the table —
  *
  *  - `graft.bloomCols`: the post-commit sidecar build touches exactly
  *    the new files (buildBloomIndex skips files whose sidecar
  *    exists), so one-file appends to a 50-file table and a 500-file
  *    table cost the same;
  *  - `graft.autoCompact`: the small-file heal reads only the touched
  *    partition, so appends to a 16-partition and a 160-partition
  *    table heal for the same price.
  *
  * Measured, not asserted — usage:
  * `sbt "runMain graft.tools.ScaleCheckProps"`. */
object ScaleCheckProps {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scaleprops")
    import spark.implicits._

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- declared bloom: append one file at two table sizes ----
    def bloomAppend(files: Int): Double = {
      val path = java.nio.file.Files
        .createTempDirectory(s"scaleprops_bloom_$files").toString + "/t"
      TxLog.create(
        spark.range(0, files * 1000L).select(col("id").as("k"),
          lit(1.0).as("v")).repartition(files),
        path, statsCols = Seq("k"))
      TxLog.setProperties(spark, path, Map(TxLog.BloomColsProp -> "k"))
      // warm: one throwaway append so codegen/JIT is out of the timing
      TxLog.append(Seq((-1L, 0.0)).toDF("k", "v").coalesce(1), path)
      timed(TxLog.append(
        spark.range(files * 1000L, files * 1000L + 1000L)
          .select(col("id").as("k"), lit(2.0).as("v")).coalesce(1), path))
    }
    val b1 = bloomAppend(50)
    val b10 = bloomAppend(500)
    println(f"[scaleprops] bloom append: 50-file table ${b1}%6.2f s, " +
      f"500-file table ${b10}%6.2f s -> ${b10 / b1}%4.1fx at 10x files " +
      "(expect ~flat: sidecar build is O(new files))")

    // ---- declared autoCompact: heal cost vs partition count ----
    def acAppend(parts: Int): Double = {
      val path = java.nio.file.Files
        .createTempDirectory(s"scaleprops_ac_$parts").toString + "/t"
      TxLog.create(
        spark.range(0, parts * 100L).select(col("id").as("k"),
          (col("id") % parts).cast("string").as("part"), lit(1.0).as("v")),
        path, Some("part"))
      TxLog.setProperties(spark, path, Map(TxLog.AutoCompactProp -> "true"))
      spark.conf.set("graft.txlog.autoCompactMinFiles", "3")
      try timed {
        // three appends into ONE partition trip the heal there
        (1 to 3).foreach(i => TxLog.append(
          Seq((100000L + i, "0", 2.0)).toDF("k", "part", "v"), path))
      } finally spark.conf.unset("graft.txlog.autoCompactMinFiles")
    }
    val a1 = acAppend(16)
    val a10 = acAppend(160)
    println(f"[scaleprops] autoCompact heal: 16-part table ${a1}%6.2f s, " +
      f"160-part table ${a10}%6.2f s -> ${a10 / a1}%4.1fx at 10x partitions " +
      "(expect ~flat: the heal reads only the touched partition)")
    spark.stop()
  }
}
