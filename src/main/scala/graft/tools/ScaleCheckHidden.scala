package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.TxLog
import graft.tables.Tables

/** The shuffle-free-join claim, measured: two tables hidden-partitioned
  * `bucket(32, l_orderkey)` mount as REAL bucketed relations, so their
  * equi-join plans without an Exchange — against the same data in plain
  * TxLog tables, whose join pays two full shuffles. 1× / 10× lineitem
  * (orders pre-aggregated so the join is 1:1), broadcast disabled so
  * the comparison is SortMergeJoin vs SortMergeJoin.
  *
  * The plan shape is ASSERTED each tier (no 'Exchange hashpartitioning'
  * on the bucketed side, present on the plain side) — the timing ratio
  * is the headline, the assertion is the guarantee. */
object ScaleCheckHidden {
  private def t(name: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[scalehidden] $name%-34s $s%8.2f s  rows=$n")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalehidden")
    val d = "/root/testdata/sf0.1"
    val root = "/tmp/graft_scalehidden"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("graft.txlog.optimizedWrite", "true")

    val li = Tables.lineitem(spark, d)
    def orders(factor: Int): DataFrame =
      (0 until factor).map(i => li.select(
          (col("l_orderkey") + lit(i * 10000000L)).as("k"),
          col("l_quantity"), col("l_extendedprice")))
        .reduce(_ unionAll _)
        .groupBy("k")
        .agg(sum("l_quantity").as("qty"), sum("l_extendedprice").as("price"))

    def mount(p: String) =
      spark.read.format("graft-txlog").option("path", p).load()

    def tier(tag: String, factor: Int): Unit = {
      val base = s"$root/$tag"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val o = orders(factor)
      t(s"$tag write 2 bucketed + 2 plain") {
        TxLog.create(o.select("k", "qty"), s"$base/ba",
          hiddenPartitions = Seq("bucket(32, k)"))
        TxLog.create(o.select("k", "price"), s"$base/bb",
          hiddenPartitions = Seq("bucket(32, k)"))
        TxLog.create(o.select("k", "qty"), s"$base/pa")
        TxLog.create(o.select("k", "price"), s"$base/pb")
        1L
      }
      def revenue(a: DataFrame, b: DataFrame): (DataFrame, Long) = {
        val j = a.join(b, "k").agg(
          sum(col("qty") * col("price")).as("rev"), count(lit(1)).as("n"))
        (j, j.collect().head.getLong(1))
      }
      var bucketRows = 0L
      var sortedRows = 0L
      var plainRows = 0L
      val tb = t(s"$tag bucketed join (no Exchange)") {
        val (j, n) = revenue(mount(s"$base/ba"), mount(s"$base/bb"))
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join shuffled:\n${plan.take(1500)}")
        bucketRows = n; n
      }
      // the writer sorts every bucket file by the key, so with Spark's
      // sorted-bucket-scan conf the merge join consumes the scans
      // DIRECTLY — zero Exchange, zero Sort, fully pipelined
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val ts = t(s"$tag bucketed join (no Exchange, no Sort)") {
        val (j, n) = revenue(mount(s"$base/ba"), mount(s"$base/bb"))
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning") &&
          !plan.contains("Sort ["),
          s"sorted-bucket join still sorts:\n${plan.take(1500)}")
        sortedRows = n; n
      }
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      val tp = t(s"$tag plain join (2 shuffles)") {
        val (j, n) = revenue(mount(s"$base/pa"), mount(s"$base/pb"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("Exchange hashpartitioning"),
          "plain join unexpectedly avoided the shuffle")
        plainRows = n; n
      }
      assert(bucketRows == plainRows && sortedRows == plainRows,
        s"row drift: $bucketRows/$sortedRows vs $plainRows")
      println(f"[scalehidden] $tag plain/bucketed ${tp / tb}%.2f, " +
        f"plain/sorted ${tp / ts}%.2f")
    }
    tier("1x", 1)
    tier("10x", 10)
    spark.stop()
  }
}
