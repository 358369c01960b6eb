package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout utilities — the table-maintenance side of a 100 TB
  * warehouse. Small-file compaction is the chronic one: streaming and
  * incremental loads leave thousands of KB-sized parquet files; scans
  * then pay per-file open cost and lose row-group locality.
  */
object Layout {

  /** Rewrite a dataset into exactly ceil(rows/targetRowsPerFile)
    * parquet files. Row-exact sizing needs a counting pass — fine in a
    * maintenance window, but at 100 TB that is a full extra scan:
    * prefer [[compactBySize]] there. Uses repartition (round-robin,
    * even sizes) — at cluster scale you'd partition by a key first and
    * compact within partitions. */
  def compact(df: DataFrame, path: String, targetRowsPerFile: Long): Unit = {
    val rows = df.count()
    val files = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compaction sized from the optimizer's size estimate (parquet
    * file-index statistics — no data scan, no counting job). File
    * count = ceil(est. bytes / targetBytesPerFile); an optional
    * `maxRecordsPerFile` cap guards against under-estimates splitting
    * a partition into one oversized file. This is the 100 TB shape:
    * the only full pass over the data is the rewrite itself. */
  def compactBySize(df: DataFrame, path: String,
                    targetBytesPerFile: Long = 128L << 20,
                    maxRecordsPerFile: Long = 0L): Unit = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, ((bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt)
    val writer = df.repartition(files).write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile.toString)
     else writer).parquet(path)
  }

  /** Morton (Z-order) interleave of two bucketized dimensions: result
    * bit 2i is bit i of `a`, bit 2i+1 is bit i of `b`. Pure
    * shift/and/or column arithmetic — codegen'd, no UDF. Inputs must
    * already lie in [0, 2^bits). */
  private[graft] def mortonInterleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Z-order clustering write: rows sort by the Morton interleave of
    * two min/max-normalized numeric columns, so EVERY output file
    * covers a small rectangle of the (c1, c2) space and parquet
    * footer min/max stats prune files for predicates on EITHER column
    * — the multi-dimensional upgrade over a single-column sort, which
    * skips perfectly on the sort key and not at all on the other. At
    * 100 TB this is what keeps "chr = 7 AND pos BETWEEN …" (or
    * region × date) scans from touching the whole table.
    *
    * The only pre-pass is a 4-value min/max aggregate (one bounded
    * driver hop); the rewrite itself is the single full pass.
    * Min/max bucketization is value-linear — a heavily skewed
    * dimension concentrates buckets and weakens skipping on that
    * column; use [[zorderByQuantiles]] (equi-depth boundaries, still
    * one bounded pre-pass) when that matters. */
  def zorderBy(df: DataFrame, c1: String, c2: String, path: String,
               numFiles: Int, bits: Int = 12): Unit = {
    require(numFiles > 0 && bits >= 1 && bits <= 20,
      s"need numFiles > 0 and bits in [1, 20], got $numFiles / $bits")
    val mm = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    if (mm.isNullAt(0) || mm.isNullAt(2)) {
      // empty input or an all-null dimension: nothing to cluster by —
      // write as-is instead of NPE-ing on the missing bounds
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val top = (1L << bits) - 1
    // nulls sort to the min corner (bucket 0) — the coalesce keeps a
    // null dimension value from silently landing in the TOP bucket
    // (least() skips nulls), which would widen the last file's min/max
    // span and defeat the skipping this operator exists to provide
    def norm(c: String, lo: Double, hi: Double): Column =
      if (lo >= hi) lit(0L)
      else coalesce(
        least(lit(top), floor((col(c).cast("double") - lo) / (hi - lo) * top)).cast("long"),
        lit(0L))
    df.withColumn("_z", mortonInterleave(
        norm(c1, mm.getDouble(0), mm.getDouble(1)),
        norm(c2, mm.getDouble(2), mm.getDouble(3)), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Balanced comparison tree mapping a value to its equi-depth bucket
    * (= the count of `boundaries` at or below it): a binary search
    * unrolled into nested CASE expressions — pure codegen'd column
    * arithmetic, ~log2(buckets) compares per row, no UDF, no join. */
  private[graft] def bucketTree(c: Column, boundaries: Array[Double],
                                lo: Int, hi: Int): Column =
    if (lo >= hi) lit(lo.toLong)
    else {
      val mid = (lo + hi) / 2
      when(c < boundaries(mid), bucketTree(c, boundaries, lo, mid))
        .otherwise(bucketTree(c, boundaries, mid + 1, hi))
    }

  /** Quantile-bucketized z-order write — the skew-robust variant of
    * [[zorderBy]]. Min/max normalization is value-LINEAR: on a
    * power-law column most rows collapse into a handful of low
    * buckets, every file then spans the whole dense value region, and
    * skipping decays exactly where the data lives. Equi-DEPTH buckets
    * from approxQuantile boundaries hold ~the same row count whatever
    * the distribution, so files stay narrow where the rows are.
    *
    * Pre-pass: ONE approxQuantile sketch job over both columns (the
    * bounded-driver-hop analogue of zorderBy's 4-value agg); the
    * bucket mapping is [[bucketTree]] — codegen'd compares, never a
    * per-row HOF or UDF. Repeated boundaries (heavy ties) dedupe into
    * fewer, still-ordered buckets; nulls sort to bucket 0 like
    * zorderBy; an all-null/empty dimension degrades to a constant
    * bucket rather than failing. The rewrite is the same single full
    * pass. `bits` caps at 10 (1023 probes) — file-level skipping
    * saturates far below that; 8 (256 buckets) is the default. */
  def zorderByQuantiles(df: DataFrame, c1: String, c2: String, path: String,
                        numFiles: Int, bits: Int = 8,
                        relErr: Double = 0.001): Unit =
    zorderedFrame(df, c1, c2, numFiles, bits, relErr)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The transform behind [[zorderByQuantiles]] without the write — for
    * writers with their own commit protocol (TxLog.compact stages and
    * manifest-swaps the result): quantile-bucketized Morton key, range
    * partition into `numFiles`, in-file sort, key dropped. */
  def zorderedFrame(df: DataFrame, c1: String, c2: String,
                    numFiles: Int, bits: Int = 8,
                    relErr: Double = 0.001): DataFrame = {
    require(numFiles > 0 && bits >= 1 && bits <= 10,
      s"need numFiles > 0 and bits in [1, 10], got $numFiles / $bits")
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val Array(bs1, bs2) = df
      .select(col(c1).cast("double").as(c1), col(c2).cast("double").as(c2))
      .stat.approxQuantile(Array(c1, c2), probes, relErr)
      .map(_.distinct.sorted)
    // deduped boundaries can leave far fewer than 2^bits buckets (heavy
    // ties) — rescale to span the full bit range, or the interleave's
    // HIGH bits would sit constant and the z-curve would discriminate
    // on this dimension only in its low-order (intra-file) bits
    def norm(c: String, bs: Array[Double]): Column =
      if (bs.isEmpty) lit(0L)
      else {
        val scale = ((1 << bits) - 1).toDouble / bs.length
        when(col(c).isNull, lit(0L))
          .otherwise(floor(
            bucketTree(col(c).cast("double"), bs, 0, bs.length) * lit(scale))
            .cast("long"))
      }
    df.withColumn("_z", mortonInterleave(norm(c1, bs1), norm(c2, bs2), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Morton interleave across N dimensions: bit i of dimension d lands
    * at position i·N + d — the [[mortonInterleave]] generalization,
    * still pure shift/and/or codegen'd arithmetic. Total bits (N·bits)
    * must fit a long. */
  private[graft] def mortonInterleaveN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n * bits <= 63, s"$n dims × $bits bits overflow a long")
    dims.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, d)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i * (n - 1) + d))
      }
    }
  }

  /** N-column z-order clustering write — [[zorderByQuantiles]] beyond
    * two dimensions (region × date × size, chr × pos × maf): every
    * output file covers a small N-box of the clustered space, so
    * min/max skipping serves predicates on ANY tracked column. Bits
    * split the long across N dims (⌊63/N⌋ capped at `bits`); each
    * dimension buckets by equi-depth quantiles (one sketch pre-pass
    * total — approxQuantile batches all N columns). More dims spread
    * the same bit budget thinner, so cluster on the columns queries
    * actually constrain — 2-4 in practice. */
  def zorderedFrameN(df: DataFrame, cols: Seq[String], numFiles: Int,
                     bits: Int = 8, buckets: Int = 64): DataFrame = {
    require(cols.size >= 2, s"need >= 2 cluster columns, got ${cols.size}")
    val b = math.min(bits, 63 / cols.size)
    val top = (1L << b) - 1
    val bs = df.stat.approxQuantile(cols.toArray,
      (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
    def norm(c: String, boundaries: Array[Double]): Column =
      if (boundaries.isEmpty || boundaries.head == boundaries.last) lit(0L)
      else {
        val scale = top.toDouble / boundaries.length
        when(col(c).isNull, lit(0L))
          .otherwise(floor(
            bucketTree(col(c).cast("double"), boundaries, 0, boundaries.length)
              * lit(scale)).cast("long"))
      }
    df.withColumn("_z",
        mortonInterleaveN(cols.zip(bs).map { case (c, bnd) => norm(c, bnd) }, b))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Table-health audit — the advisor that tells you WHEN to run the
    * maintenance passes above: walks a parquet table's file metadata
    * (names and sizes only — no data read, no Spark job) and reports
    * per-directory file count, byte totals, and the small-file
    * fraction against `targetBytes`. The standing check a lake runs
    * nightly; `smallFileFrac` near 1 with many files is the compact
    * signal, and a partition directory dominating `bytes` is the
    * skew/repartition signal. */
  def tableHealth(spark: org.apache.spark.sql.SparkSession, path: String,
                  targetBytes: Long = 128L << 20): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, DoubleType, StringType, StructField, StructType}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def walk(dir: org.apache.hadoop.fs.Path, rel: String): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && !name.startsWith("_") && !name.startsWith("."))
          walk(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
        else if (name.endsWith(".parquet")) acc += ((rel, st.getLen))
      }
    walk(root, "")
    val rows = acc.groupBy(_._1).toSeq.sortBy(_._1).map { case (dir, files) =>
      val sizes = files.map(_._2)
      Row(if (dir.isEmpty) "." else dir, sizes.length.toLong, sizes.sum,
        sizes.min, sizes.max,
        sizes.count(_ < targetBytes / 2).toDouble / sizes.length)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dir", StringType), StructField("n_files", LongType),
        StructField("bytes", LongType), StructField("min_bytes", LongType),
        StructField("max_bytes", LongType),
        StructField("small_file_frac", DoubleType))))
  }
}
