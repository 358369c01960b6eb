package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout utilities — the table-maintenance side of a 100 TB
  * warehouse. Small-file compaction is the chronic one: streaming and
  * incremental loads leave thousands of KB-sized parquet files; scans
  * then pay per-file open cost and lose row-group locality.
  */
object Layout {

  /** Rewrite a dataset into ~`targetRowsPerFile`-row parquet files.
    * Uses repartition (round-robin, even sizes) — at cluster scale
    * you'd partition by a key first and compact within partitions. */
  def compact(df: DataFrame, path: String, targetRowsPerFile: Long): Unit = {
    val rows = df.count()
    val files = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(path)
  }
}
