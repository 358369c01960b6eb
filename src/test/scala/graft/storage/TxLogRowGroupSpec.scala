package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Row-group-grain skip stats (SURVEY §7 frontier (e)) — adjudicated:
  * the manifest's min/max is FILE grain; ROW-GROUP grain already
  * exists in every parquet footer, and Spark's stock vectorized
  * reader prunes row groups (and pages, via column indexes) from
  * pushed filters. What the engine owns is the LAYOUT: a sorted or
  * z-ordered write makes footer stats selective, an unsorted one
  * makes them useless. This spec measures that directly with the
  * parquet-hadoop footer API — reader-independent evidence that the
  * layout, not the reader, is the lever.
  */
class TxLogRowGroupSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rg_$tag").toString + "/tbl"

  /** Per-row-group [min,max] of long column `col` in one parquet file. */
  private def groupBounds(file: String, col: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      scala.jdk.CollectionConverters.ListHasAsScala(r.getFooter.getBlocks)
        .asScala.toSeq.map { b =>
          val c = scala.jdk.CollectionConverters.ListHasAsScala(b.getColumns)
            .asScala.find(_.getPath.toDotString == col)
            .getOrElse(sys.error(s"no column chunk '$col' in $file"))
          val st = c.getStatistics
            .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
          (st.getMin, st.getMax)
        }
    } finally r.close()
  }

  test("sorted layout: a narrow range admits ~1 of many row groups by footer stats; shuffled admits all") {
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hconf.get("parquet.block.size"))
    hconf.setInt("parquet.block.size", 256 * 1024) // many row groups per file
    try {
      val n = 200000
      val rows = (1 to n).map(i => (i.toLong, s"payload_$i%032d"))
      // SORTED single file — the layout a sorted/z-ordered OPTIMIZE
      // produces at file grain
      val sortedPath = freshPath("sorted")
      TxLog.create(rows.toDF("k", "pad").coalesce(1).sortWithinPartitions("k"),
        sortedPath)
      val mS = TxLog.manifest(spark, sortedPath, 1L)
      assert(mS.files.size == 1)
      val sortedBounds = groupBounds(s"$sortedPath/data/${mS.files.head}", "k")
      assert(sortedBounds.size >= 4,
        s"need multiple row groups to measure, got ${sortedBounds.size}")
      // sorted ⇒ group ranges are non-overlapping (contiguous slices)
      sortedBounds.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"sorted groups overlap: $hi1 > $lo2")
        case _ =>
      }
      // the footer-stats admission a row-group pruner computes: a
      // narrow range hits exactly one contiguous slice
      val (qlo, qhi) = (n / 2L, n / 2L + 50L)
      def admitted(bounds: Seq[(Long, Long)]): Int =
        bounds.count { case (lo, hi) => qlo <= hi && qhi >= lo }
      assert(admitted(sortedBounds) <= 2,
        s"sorted layout must admit ~1 group, admitted ${admitted(sortedBounds)} " +
          s"of ${sortedBounds.size}")
      // SHUFFLED control — same rows, hash order: every group spans
      // nearly the full domain, nothing can skip
      val shuffledPath = freshPath("shuffled")
      TxLog.create(rows.toDF("k", "pad").coalesce(1)
        .sortWithinPartitions(hash(col("k"))), shuffledPath)
      val mU = TxLog.manifest(spark, shuffledPath, 1L)
      val shuffledBounds = groupBounds(s"$shuffledPath/data/${mU.files.head}", "k")
      assert(shuffledBounds.size >= 4)
      assert(admitted(shuffledBounds) == shuffledBounds.size,
        "a shuffled layout admits every row group — the layout is the lever")
      // and Spark pushes the predicate into the scan, so the stock
      // reader actually consults those footer stats at execution
      val q = TxLog.read(spark, sortedPath)
        .filter(col("k") >= qlo && col("k") <= qhi)
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(sys.error("no FileSourceScanExec in the plan"))
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("GreaterThanOrEqual(k,") &&
        pushed.contains("LessThanOrEqual(k,"),
        s"range must reach the parquet scan, got: $pushed")
      assert(q.count() == qhi - qlo + 1)
    } finally {
      oldBlock match {
        case Some(s) => hconf.set("parquet.block.size", s)
        case None => hconf.unset("parquet.block.size")
      }
    }
  }
}
