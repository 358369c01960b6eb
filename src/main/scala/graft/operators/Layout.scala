package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
