package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Co-located joins via bucketed layout — the write-once/join-many half
  * of the 100 TB join story: two fact tables bucketed on their join key
  * with the same bucket count hash-agree file-by-file, so every
  * subsequent join between them plans with ZERO exchange on either side
  * (and zero sort when each bucket is one sorted file). The repeated
  * per-query shuffle of a fact⋈fact join — the dominant cost of a
  * recurring 100 TB ETL join — is paid ONCE at layout time.
  *
  * Spark's bucketing metadata lives in the CATALOG entry, not in the
  * parquet footers: `spark.read.parquet(path)` on a bucketed directory
  * silently forgets the layout (scans fine, but shuffles again). That is
  * why [[ensure]] hands back the catalog-backed `spark.table(name)` and
  * why it re-registers (rather than path-loads) when the catalog is
  * cold — re-creating the table is the only way to reattach the bucket
  * spec in an in-memory catalog. With a persistent metastore the
  * registration survives and rewrites never happen.
  *
  * The write repartitions on the bucket column first so each task holds
  * exactly one bucket's rows: without it, every task spills a sliver
  * into every bucket (tasks × buckets small files); with it, each bucket
  * is one sorted file — which is also the shape Spark's sorted-bucket
  * read optimization needs to drop the join's Sort nodes.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * and return the catalog-backed frame. Idempotent per (session,
    * name): an existing catalog registration is reused as-is; a cold
    * catalog (fresh session) rewrites the layout under `path`.
    */
  def ensure(spark: SparkSession, name: String, df: DataFrame,
             bucketCol: String, numBuckets: Int, path: String): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      // a previous JVM's data dir outlives its in-memory catalog; clear
      // it so the overwrite never merges with orphaned files
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      df.repartition(numBuckets, col(bucketCol))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(numBuckets, bucketCol)
        .sortBy(bucketCol)
        .saveAsTable(name)
    }
    spark.table(name)
  }
}
