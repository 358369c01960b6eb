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
    * driver — nlist ≈ √N doubles·dim is a few MB even at 10^9 vectors.
    * `spill` > 1 means every vector is stored in its `spill` nearest
    * cells (multi-assignment). */
  case class IvfIndex(path: String, centroids: Array[(Int, Array[Double])],
                      spill: Int = 1) {
    def nlist: Int = centroids.length
    def dim: Int = centroids.head._2.length
  }

  /** Offline index build. `nlist <= 0` derives ~√N (min 4); the KMeans
    * fit sees at most `fitSampleRows` vectors regardless of corpus
    * size.
    *
    * `spill` > 1 is MULTI-ASSIGNMENT (spilled IVF): each vector lands
    * in its `spill` nearest cells, so a fixed-nprobe query also finds
    * boundary vectors whose own cell was not probed but whose
    * second-nearest was. The trade is explicit: storage and per-cell
    * scan size grow ×spill while the probe count stays put — on
    * near-random embeddings (neighbors scatter across Voronoi
    * boundaries, the ANN worst case) this buys more recall per scanned
    * byte than raising nprobe (§6c ledger). Queries on a spilled index
    * dedupe by vec_id before top-k, so results stay exact-over-probed
    * and exhaustive probing is still brute-force-identical. */
  def fit(emb: DataFrame, path: String, nlist: Int = 0,
          fitSampleRows: Long = 200000L, seed: Long = 42L,
          spill: Int = 1): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(spill >= 1, s"Ivf.fit: spill must be >= 1, got $spill")
    val n = emb.count()
    val k = if (nlist > 0) nlist else math.max(4, math.sqrt(n.toDouble).toInt)
    require(spill <= k, s"Ivf.fit: spill ($spill) cannot exceed nlist ($k)")
    val feat = emb.withColumn("features", array_to_vector(col("embedding")))
    val fitOn =
      if (n > fitSampleRows) feat.sample(withReplacement = false, fitSampleRows.toDouble / n, seed)
      else feat
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(fitOn)
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val matrix = cents.sortBy(_._1).map(_._2)
    // one linear assignment pass; the partitioned write is what buys
    // every query its partition pruning. The codegen'd argmin applies
    // KMeans' own nearest/lowest-id rule, so spill=1 ≡ model.transform
    val assigned =
      if (spill == 1)
        emb.select(col("vec_id"), col("embedding"),
          graft.functions.IvfFunctions.ivf_assign(
            col("embedding"), matrix).as("cell"))
      else
        emb.select(col("vec_id"), col("embedding"),
          explode(graft.functions.IvfFunctions.ivf_assign_multi(
            col("embedding"), matrix, spill)).as("cell"))
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    val spark = emb.sparkSession
    import spark.implicits._
    cents.toIndexedSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    writeMeta(spark, path, spill)
    IvfIndex(path, cents, spill)
  }

  /** Index metadata sidecar (`path/meta.json`) — currently just the
    * spill factor; absent means 1 (pre-spill indexes). */
  private def writeMeta(spark: SparkSession, path: String, spill: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"spill":$spill}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 1
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s).get("spill").asInt(1)
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
    // single-writer ENFORCED (r16): racing maintainers serialize on the
    // artifact lock instead of interleaving parquet appends with a
    // concurrent remove's cell rewrite (which could resurrect or drop
    // vectors); a crashed holder's lock breaks by age and the re-run is
    // idempotent at the caller's grain
    ArtifactLock.withLock(spark, index.path, "Ivf.append") {
      val assigned =
        if (index.spill == 1)
          newEmb.select(col("vec_id"), col("embedding"),
            graft.functions.IvfFunctions.ivf_assign(
              col("embedding"), centroidMatrix(index)).as("cell"))
        else // a spilled index keeps its multi-assignment rule on ingest
          newEmb.select(col("vec_id"), col("embedding"),
            explode(graft.functions.IvfFunctions.ivf_assign_multi(
              col("embedding"), centroidMatrix(index), index.spill)).as("cell"))
      assigned.write.mode("append").partitionBy("cell")
        .parquet(s"${index.path}/vectors")
    }

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
    ArtifactLock.withLock(spark, index.path, "Ivf.remove") {
      removeFromCells(spark, s"${index.path}/vectors", ids)
      val codes = new org.apache.hadoop.fs.Path(s"${index.path}/codes")
      val fs = codes.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(codes)) removeFromCells(spark, codes.toString, ids)
    }
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
    IvfIndex(path, cents, readMeta(spark, path))
  }

  /** ANN query: driver-side centroid argmin → partition-pruned scan of
    * the nprobe closest cells → exact cosine → top-k
    * (TakeOrderedAndProject — per-partition heaps, no global sort). */
  def query(spark: SparkSession, index: IvfIndex, queryVec: Array[Double],
            k: Int = 10, nprobe: Int = 4, excludeId: Option[Long] = None,
            vectorsRel: Option[DataFrame] = None): DataFrame = {
    val probeCells = nearestCells(index, queryVec, nprobe)
    val qCol = array(queryVec.map(lit).toIndexedSeq: _*)
    // `vectorsRel` lets a batch caller build the vectors relation ONCE:
    // each spark.read.parquet costs a driver-side file listing + schema
    // inference, which dominated the |Q|-query eval batch (guide §5)
    val cells = vectorsRel
      .getOrElse(spark.read.parquet(s"${index.path}/vectors"))
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*))
    val scored = excludeId.fold(cells)(id => cells.filter(col("vec_id") =!= id))
      .select(
        col("vec_id"),
        round(Similarity.cosine(col("embedding"), qCol), 6).as("cosine"))
    // a spilled index can surface a vector from two probed cells — its
    // copies score identically, so any-survivor dedup is exact
    val unique =
      if (index.spill > 1) scored.dropDuplicates("vec_id") else scored
    unique
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
    // one vectors relation shared by every per-query branch (one file
    // listing instead of |Q|)
    val vectors = spark.read.parquet(s"${index.path}/vectors")
    queryIds.map { qid =>
      query(spark, index, qvecs(qid), k, nprobe, excludeId = Some(qid),
          vectorsRel = Some(vectors))
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
