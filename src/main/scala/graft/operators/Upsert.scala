package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge/upsert semantics over immutable parquet — the reference's
  * load pattern (`INSERT INTO gwas SELECT ... FROM load_gwas` onto a
  * (kgp_id, study_id) primary key, postgres_process.Rmd:121) as a
  * declarative operator, and what a Delta MERGE would do here.
  *
  * Scale shape: the anti join shuffles on the key (or broadcasts when
  * updates are small — the common case for corrections), the union is
  * free; rewriting only affected partitions is the partition-pruned
  * variant below.
  */
object Upsert {

  /** updates win on key collision; everything else is kept. */
  def mergeByKey(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(existing.join(updates.select(keys.map(col): _*), keys, "left_anti"))

  /** Partition-pruned merge: only partitions named in `updates` are
    * rewritten — at 100 TB you merge into the handful of chr/date
    * partitions that changed, not the table. Returns (partitionsTouched,
    * merged-rows-for-those-partitions); the caller overwrites exactly
    * those partition directories (dynamic partition overwrite). */
  def mergePartitioned(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                       partitionCol: String): (Seq[Any], DataFrame) = {
    val parts = updates.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    val touched = existing.filter(col(partitionCol).isin(parts: _*))
    (parts, mergeByKey(touched, updates, keys))
  }
}
