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
  * variant below, and `mergeInto` finishes the job with a
  * dynamic-partition-overwrite write that leaves every untouched
  * partition's files physically untouched.
  */
object Upsert {

  /** updates win on key collision; everything else is kept. */
  def mergeByKey(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(existing.join(updates.select(keys.map(col): _*), keys, "left_anti"))

  /** Partition-pruned merge: returns (partitionsToRewrite, merged rows
    * for exactly those partitions) — at 100 TB you merge into the
    * handful of chr/date partitions that changed, not the table.
    *
    * The rewrite set covers BOTH sides of a key move: partitions named
    * in `updates` (receiving rows) AND partitions currently holding a
    * key whose update lands in a different partition — without the
    * latter, a moved key's stale row would survive in its old
    * partition and the table would carry a duplicate primary key. The
    * moved-key probe is one join of the two key columns, broadcast-able
    * whenever the updates side is. */
  def mergePartitioned(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                       partitionCol: String): (Seq[Any], DataFrame) = {
    val target = updates.select(col(partitionCol))
    val moved = existing.select((keys :+ partitionCol).map(col): _*)
      .join(
        updates.select((keys.map(col) :+ col(partitionCol).as("__part_new")): _*),
        keys)
      .filter(col(partitionCol) =!= col("__part_new"))
      .select(col(partitionCol))
    val parts = target.union(moved).distinct().collect().map(_.get(0)).toSeq
    val touched = existing.filter(col(partitionCol).isin(parts: _*))
    // anti join on the keys ALONE (not key+partition): this is what
    // drops a moved key's old row from its old partition
    (parts, mergeByKey(touched, updates, keys))
  }

  /** End-to-end merge into a parquet table on disk, the plain-parquet
    * equivalent of a Delta MERGE: compute the partition-pruned merge,
    * stage it, then dynamic-partition-overwrite the table — only the
    * rewritten partitions' directories change; every other partition's
    * files stay byte-identical (asserted in WarehouseQueriesSpec).
    *
    * The staging hop exists because Spark (correctly) refuses to
    * overwrite a path it is reading from; the extra write is bounded by
    * the touched partitions, not the table. A transactional log (Delta)
    * would replace the stage+rewrite with a commit — the partition
    * arithmetic above is unchanged. */
  def mergeInto(tablePath: String, updates: DataFrame, keys: Seq[String],
                partitionCol: String): Seq[Any] = {
    import org.apache.hadoop.fs.Path
    val spark = updates.sparkSession
    val existing = spark.read.parquet(tablePath)
    val (parts, merged) = mergePartitioned(existing, updates, keys, partitionCol)
    val staging = s"$tablePath.__staging"
    merged.write.mode("overwrite").partitionBy(partitionCol).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    // partitions the merge actually produced rows for — read off the
    // staged layout, NOT by re-evaluating `merged` (it reads tablePath)
    val stagedDirs = fs.listStatus(new Path(staging))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(s"$partitionCol=")).toSet
    spark.read.parquet(staging)
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(tablePath)
    // dynamic overwrite only replaces partitions PRESENT in the written
    // data — a partition emptied by a moved key is absent from the
    // stage, so its stale directory must be dropped explicitly (what a
    // Delta MERGE's commit would record as removed files)
    parts.foreach { v =>
      val dirName = s"$partitionCol=$v"
      if (!stagedDirs.contains(dirName))
        fs.delete(new Path(s"$tablePath/$dirName"), true)
    }
    fs.delete(new Path(staging), true)
    parts
  }

  /** SCD Type 2: apply a change batch to a versioned dimension, keeping
    * full history. `dim` carries `valid_from`/`valid_to` (valid_to NULL
    * = current version); `changes` carries the keys + tracked attrs.
    * For each key whose tracked attrs actually differ, the current row
    * closes at `effectiveDate` and a fresh open version is inserted;
    * identical changes are no-ops; keys new to the dimension open their
    * first version; closed history never changes.
    *
    * Scale shape: ONE left join of current rows to changes on the key
    * feeds the closed/unchanged/new-version branches (Catalyst reuses
    * the exchange across the three projections of the same join), plus
    * one anti join for brand-new keys — broadcast-able whenever the
    * change batch is small, which is the daily-dimension-feed case.
    * History rows pass through untouched with no shuffle. Dates are
    * ISO strings for engine portability. */
  def scdType2(dim: DataFrame, changes: DataFrame, keys: Seq[String],
               attrs: Seq[String], effectiveDate: String,
               validFrom: String = "valid_from",
               validTo: String = "valid_to"): DataFrame = {
    val outCols = (keys ++ attrs).map(col) ++ Seq(col(validFrom), col(validTo))
    val history = dim.filter(col(validTo).isNotNull).select(outCols: _*)
    val current = dim.filter(col(validTo).isNull)
    // a key appearing twice in one batch has no well-defined version
    // order — the left join would fan out into duplicate closed rows
    // and multiple open versions (silent history corruption). Fail
    // loudly instead, like a transactional MERGE on a multi-match.
    // The check is a deliberately EAGER bounded probe (groupBy the
    // change feed's keys, limit 1): a lazy raise_error column only
    // fires if the optimizer happens to keep the side-effecting
    // expression alive, which no Catalyst contract guarantees. The
    // probe aggregates only the change feed — small by this operator's
    // own assumption — and surfaces the offending key in the error.
    val dup = changes.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .select(concat_ws(",", keys.map(k => col(k).cast("string")): _*))
      .limit(1).collect()
    require(dup.isEmpty,
      s"scdType2: duplicate change rows for key (${keys.mkString(",")})=(${if (dup.isEmpty) "" else dup.head.getString(0)})")
    val chR = changes.select(
      keys.map(col) ++ attrs.map(a => col(a).as(s"_ch_$a")): _*)
      .withColumn("_ch_present", lit(1))
    val j = current.join(chR, keys, "left")
    // null-safe attr compare: a null attr on either side is a real value
    val differs = col("_ch_present").isNotNull &&
      attrs.map(a => !(col(a) <=> col(s"_ch_$a"))).reduce(_ || _)
    val closed = j.filter(differs).select(
      (keys ++ attrs).map(col) ++
        Seq(col(validFrom), lit(effectiveDate).as(validTo)): _*)
    val unchanged = j.filter(!differs).select(outCols: _*)
    val newVersions = j.filter(differs).select(
      keys.map(col) ++ attrs.map(a => col(s"_ch_$a").as(a)) ++
        Seq(lit(effectiveDate).as(validFrom),
          lit(null).cast("string").as(validTo)): _*)
    val brandNew = chR.join(current.select(keys.map(col): _*), keys, "left_anti")
      .select(
        keys.map(col) ++ attrs.map(a => col(s"_ch_$a").as(a)) ++
          Seq(lit(effectiveDate).as(validFrom),
            lit(null).cast("string").as(validTo)): _*)
    history.unionByName(closed).unionByName(unchanged)
      .unionByName(newVersions).unionByName(brandNew)
  }
}
