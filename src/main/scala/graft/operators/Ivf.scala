package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor index with an
  * explicit offline-build / online-query lifecycle.
  *
  * Build (`fit`, run once, offline): KMeans over a bounded SAMPLE of the
  * corpus picks `nlist` Voronoi centroids; every vector is assigned to
  * its nearest centroid in one pass and the corpus is written
  * partitioned by `cell`, centroids persisted next to it. At 100 TB the
  * fit touches `fitSampleRows` vectors (constant), the assignment is one
  * linear scan, and the write is the same shuffle any clustering write
  * costs — all amortized across every future query.
  *
  * Query (`query`, per request): centroids are nlist ≈ √N rows — they
  * load once onto the driver, the argmin over them is plain math (no
  * Spark job), and the scan reads ONLY the `nprobe` closest cell
  * partitions via partition pruning (`cell` is a partition column, so
  * the isin filter prunes at file-listing time — asserted in
  * SimilaritySpec). Exact cosine + top-k over ~nprobe/nlist of the data;
  * no KMeans anywhere on the query path.
  *
  * Sizing: nlist defaults to ~√N, so a cell holds ~√N vectors and a
  * query with nprobe cells scans ~nprobe·√N rows — at 10^9 vectors and
  * nprobe = 8 that is ~256k cosines, not 10^9.
  */
object Ivf {

  /** Handle to a persisted index: `path/vectors` (parquet, partitioned
    * by cell) + `path/centroids` (nlist rows). Centroids ride on the
    * driver — nlist ≈ √N doubles·dim is a few MB even at 10^9 vectors. */
  case class IvfIndex(path: String, centroids: Array[(Int, Array[Double])]) {
    def nlist: Int = centroids.length
    def dim: Int = centroids.head._2.length
  }

  /** Offline index build. `nlist <= 0` derives ~√N (min 4); the KMeans
    * fit sees at most `fitSampleRows` vectors regardless of corpus
    * size. */
  def fit(emb: DataFrame, path: String, nlist: Int = 0,
          fitSampleRows: Long = 200000L, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = emb.count()
    val k = if (nlist > 0) nlist else math.max(4, math.sqrt(n.toDouble).toInt)
    val feat = emb.withColumn("features", array_to_vector(col("embedding")))
    val fitOn =
      if (n > fitSampleRows) feat.sample(withReplacement = false, fitSampleRows.toDouble / n, seed)
      else feat
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(fitOn)
    // one linear assignment pass; the partitioned write is what buys
    // every query its partition pruning
    model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    cents.toIndexedSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    IvfIndex(path, cents)
  }

  /** Incremental index maintenance — the daily-ingest counterpart of
    * Dedup.incrementalIngest: assign a new batch to the EXISTING
    * centroids (no refit, no corpus rescan) and append its rows to the
    * cell partitions. Assignment is the codegen'd
    * [[graft.functions.IvfAssign]] argmin — the same
    * nearest-center/lowest-id rule KMeans' transform applied at fit
    * time — so appended vectors land exactly where queries will probe
    * for them. The parquet append only ADDS part files: every
    * pre-existing file stays byte-identical (spec-pinned), which is
    * what lets a TxLog-style manifest carry old cells by reference.
    * Centroids drift from the true Voronoi fit only as the corpus
    * distribution drifts; refitting stays an offline decision. */
  def append(spark: SparkSession, index: IvfIndex, newEmb: DataFrame): Unit =
    newEmb
      .select(col("vec_id"), col("embedding"),
        graft.functions.IvfFunctions.ivf_assign(
          col("embedding"), centroidMatrix(index)).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"${index.path}/vectors")

  /** Deletion counterpart of [[append]] — the index side of a GDPR
    * erasure (pairs with TxLog.deleteWhere on the source table): drop
    * `ids` from the index WITHOUT refit or corpus rescan. Only cells
    * actually holding a deleted vector rewrite (filtered through a
    * broadcast anti-join — plan size stays O(1) however large the
    * erasure batch); untouched cells' files are never opened. When the
    * PQ codes sidecar (`path/codes`) exists it rewrites IN THE SAME
    * CALL — a vector present in codes but not vectors would ADC-score
    * into the shortlist and then silently vanish at re-rank, shrinking
    * k without an error.
    *
    * Not a transactional commit: index artifacts are rebuildable
    * offline products under the single-writer maintenance contract
    * [[append]] already assumes (a concurrent query may glimpse a
    * half-removed batch; re-running remove is idempotent). */
  def remove(spark: SparkSession, index: IvfIndex, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "Ivf.remove: empty id batch")
    removeFromCells(spark, s"${index.path}/vectors", ids)
    val codes = new org.apache.hadoop.fs.Path(s"${index.path}/codes")
    val fs = codes.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(codes)) removeFromCells(spark, codes.toString, ids)
  }

  /** Rewrite only the cell partitions of `dir` containing an id from
    * `ids`; a cell emptied by the removal drops its directory. */
  private def removeFromCells(spark: SparkSession, dir: String,
                              ids: Seq[Long]): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idsDf = broadcast(ids.toDF("_del_id"))
    val all = spark.read.parquet(dir)
    val touched = all.join(idsDf, col("vec_id") === col("_del_id"))
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val tmp = s"${dir}_rewrite_${java.util.UUID.randomUUID().toString.take(8)}"
    all.filter(col("cell").isin(touched: _*))
      .join(idsDf, col("vec_id") === col("_del_id"), "left_anti")
      .write.partitionBy("cell").parquet(tmp)
    touched.foreach { c =>
      fs.delete(new Path(dir, s"cell=$c"), true)
      val src = new Path(tmp, s"cell=$c")
      if (fs.exists(src)) fs.rename(src, new Path(dir, s"cell=$c"))
    }
    fs.delete(new Path(tmp), true)
  }

  /** centroids as a cell-id-indexed matrix (row i = cell i's center). */
  private[graft] def centroidMatrix(index: IvfIndex): Array[Array[Double]] =
    index.centroids.sortBy(_._1).map(_._2)

  /** Reopen a persisted index (the steady-state query-serving entry —
    * no corpus scan, just the nlist centroid rows). */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    IvfIndex(path, cents)
  }

  /** ANN query: driver-side centroid argmin → partition-pruned scan of
    * the nprobe closest cells → exact cosine → top-k
    * (TakeOrderedAndProject — per-partition heaps, no global sort). */
  def query(spark: SparkSession, index: IvfIndex, queryVec: Array[Double],
            k: Int = 10, nprobe: Int = 4, excludeId: Option[Long] = None): DataFrame = {
    val probeCells = nearestCells(index, queryVec, nprobe)
    val qCol = array(queryVec.map(lit).toIndexedSeq: _*)
    val cells = spark.read.parquet(s"${index.path}/vectors")
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*))
    excludeId.fold(cells)(id => cells.filter(col("vec_id") =!= id))
      .select(
        col("vec_id"),
        round(Similarity.cosine(col("embedding"), qCol), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }

  /** Recall-eval batch: run [[query]] for every id in `queryIds` (each
    * a partition-pruned scan) and tag rows with the query id. The
    * query-vector collect and the per-query union are bounded by |Q| —
    * this is the eval harness for tuning nlist/nprobe (pair with
    * Similarity.cosineTopKBatch + recallAtK), not a serving path. */
  def queryBatch(spark: SparkSession, index: IvfIndex, emb: DataFrame,
                 queryIds: Seq[Long], k: Int = 10, nprobe: Int = 4): DataFrame = {
    val qvecs = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    queryIds.map { qid =>
      query(spark, index, qvecs(qid), k, nprobe, excludeId = Some(qid))
        .select(lit(qid).as("qid"), col("vec_id"), col("cosine"))
    }.reduce(_ unionAll _)
  }

  /** The nprobe cells whose centroids sit closest to the query —
    * driver math over the nlist centroid rows, shared by the IVF query
    * path and the IVF-PQ composition (Pq.ivfQuery). */
  private[operators] def nearestCells(index: IvfIndex, queryVec: Array[Double],
                                      nprobe: Int): Array[Int] =
    index.centroids
      .map { case (i, c) => (i, sqdist(c, queryVec)) }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobe).map(_._1)

  private def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
}
