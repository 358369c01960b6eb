package graft.tools

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GraftSession
import graft.storage.TxLog

/** Cost harness for IDENTITY allocation: what does the dense fill
  * (one count pass + zipWithIndex's per-partition count job + the
  * indexed map, per batch) add to an append, at batch sizes where the
  * write itself is the dominant cost?
  *
  * Two identical tables — one plain, one with a GENERATED ALWAYS AS
  * IDENTITY surrogate key — take the same 6M-row append twice (the
  * first pair pays JIT). The honest number is the WARM ratio: the fill
  * is two extra narrow passes over the batch (no shuffle, no driver
  * data), so the overhead should be a small constant factor of the
  * batch scan, not of the table. Usage:
  * `sbt "runMain graft.tools.ScaleCheckIdentity"` (arg overrides rows). */
object ScaleCheckIdentity {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scaleid")
    val rows = args.headOption.map(_.toLong).getOrElse(6000000L)
    val batch = spark.range(rows)
      .select((col("id") % 997).cast("double").as("v"),
        (col("id") % 31).cast("string").as("tag"))
    def fresh(withIdentity: Boolean): String = {
      val p = java.nio.file.Files
        .createTempDirectory("graft_scaleid").toString + "/tbl"
      val ddl = if (withIdentity) "id BIGINT, v DOUBLE, tag STRING"
                else "v DOUBLE, tag STRING"
      TxLog.create(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType.fromDDL(ddl)), p)
      if (withIdentity) TxLog.setColumnIdentity(spark, p, "id")
      p
    }
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val plain = fresh(withIdentity = false)
    val ident = fresh(withIdentity = true)
    val tP1 = timeIt(TxLog.append(batch, plain))
    val tI1 = timeIt(TxLog.append(batch, ident))
    val tP2 = timeIt(TxLog.append(batch, plain))
    val tI2 = timeIt(TxLog.append(batch, ident))
    // the invariant the cost buys: every id distinct, fully dense
    val n = TxLog.read(spark, ident).count()
    val distinct = TxLog.read(spark, ident).select("id").distinct().count()
    require(n == 2 * rows && distinct == n, s"density broken: $n vs $distinct")
    println(f"[scaleid] rows=$rows%8d  plain append cold=$tP1%6.2f s " +
      f"warm=$tP2%6.2f s | identity cold=$tI1%6.2f s warm=$tI2%6.2f s " +
      f"| warm overhead ${tI2 / tP2}%4.2fx")
    spark.stop()
  }
}
