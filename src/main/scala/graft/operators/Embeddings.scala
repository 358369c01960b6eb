package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-matrix analytics: PCA over an `Array[Float]` column —
  * the dimensionality reducer a training-data pipeline runs before
  * clustering, visualization, or cheap pre-filtering of ANN candidates
  * (project to 8-16 dims, prune, re-rank in full dim).
  *
  * Scale design: the distributed work is ONE pass that reduces the
  * corpus to d² + d + 1 exact decimal sums (d = embedding dim, so
  * 4,161 numbers at d=64) via posexplode + two-phase hash aggregation —
  * each task partially aggregates its rows to the d²-sized state before
  * anything shuffles, so the wire carries partitions × d² rows no
  * matter how many vectors the corpus holds, and nothing row-sized is
  * ever collected. The eigendecomposition runs on the driver over the
  * d×d covariance (a 64×64 Jacobi solve — microseconds), which is the
  * correct split at any corpus size: the data-sized problem is
  * distributed, the d-sized problem is not worth a cluster.
  *
  * Determinism: double sums are partition-order-dependent, so the
  * moment accumulation goes through DECIMAL(38,12) (the Det.dsum
  * rationale) — the collected sums, hence the covariance, hence the
  * Jacobi result, are bit-identical across partitionings and reruns.
  * Eigenvector sign is fixed by making the largest-|entry| coordinate
  * positive (first index on ties).
  */
object Embeddings {

  /** PCA model: population covariance eigenpairs, eigenvalues
    * descending; `components(c)` is the c-th principal axis (length
    * `dim`), `explained(c)` its variance share of the total. */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    def explained: Array[Double] = {
      val t = eigenvalues.sum
      if (t == 0.0) eigenvalues.map(_ => 0.0) else eigenvalues.map(_ / t)
    }
  }

  /** One-pass moment accumulation + driver eigensolve. `k` picks how
    * many leading components the model keeps (k ≤ dim). Only the
    * UPPER TRIANGLE of x ⊗ x is summed (the covariance is symmetric),
    * so the per-row stats array is d(d+1)/2 + d + 1 entries — 2,145 at
    * d=64 — and the shuffle carries that many rows per task. */
  def pcaFit(emb: DataFrame, k: Int, vecCol: String = "embedding"): PcaModel = {
    val d = emb.select(size(col(vecCol))).head().getInt(0)
    require(k >= 1 && k <= d, s"need 1 <= k <= dim=$d, got $k")
    val xs = col(vecCol).cast("array<double>")
    // flattened per-row stats:
    // [1 | x_0..x_{d-1} | x_i*x_j for i <= j, row-major upper triangle]
    val upper = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(slice(xs, i + 1, lit(d)), y => element_at(xs, (i + 1).cast("int")) * y)))
    val stats = concat(array(lit(1.0)), xs, upper)
    val nStats = 1 + d + d * (d + 1) / 2
    val sums = new Array[java.math.BigDecimal](nStats)
    emb.select(posexplode(stats).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(sum(col("v").cast(DecimalType(38, 12))).as("s"))
      .collect()
      .foreach(r => sums(r.getInt(0)) = r.getDecimal(1))
    val n = sums(0).doubleValue().round
    require(n > 0, "pcaFit on an empty frame")
    val mean = Array.tabulate(d)(i => sums(1 + i).doubleValue() / n)
    // offset of row i's first upper-triangle entry: Σ_{t<i} (d - t)
    def triOff(i: Int): Int = i * d - i * (i - 1) / 2
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      sums(1 + d + triOff(lo) + (hi - lo)).doubleValue() / n - mean(i) * mean(j)
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val top = order.take(k)
    val comps = top.map { c =>
      val v = Array.tabulate(d)(i => evecs(i)(c))
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(d, n, mean, top.map(evals).toArray, comps)
  }

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, PcaModel]()

  /** [[pcaFit]] memoized on a caller-supplied dataset key (content
    * fingerprint — same convention as the IVF/PQ index caches). Safe
    * because pcaFit is partitioning-independent and deterministic
    * (decimal moment sums; PcaSpec pins it): the cached model is
    * bit-identical to a refit, so this is purely a cost optimization
    * for fit-once/project-many callers. */
  def pcaFitCached(emb: DataFrame, k: Int, cacheKey: String,
                   vecCol: String = "embedding"): PcaModel =
    modelCache.computeIfAbsent(s"$cacheKey|$k|$vecCol",
      _ => pcaFit(emb, k, vecCol))

  /** Project each vector onto the model's components: returns the
    * input's id column + `proj` (array of k doubles, centered dot
    * products). Pure per-row codegen'd arithmetic — no shuffle, no
    * collected state beyond the d×k literal weights. */
  def pcaProject(emb: DataFrame, model: PcaModel,
                 vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val centered = zip_with(
      col(vecCol).cast("array<double>"),
      typedLit(model.mean.toSeq), (x, m) => x - m)
    val projs = model.components.map { comp =>
      aggregate(
        zip_with(centered, typedLit(comp.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
    }
    emb.select(col(idCol), array(projs.toIndexedSeq: _*).as("proj"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Textbook rotations (Golub & Van Loan §8.5); converges quadratically
    * — 20 sweeps is far past machine precision for d ≤ a few hundred. */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
                                 maxSweeps: Int = 20): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (sweep < maxSweeps && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
