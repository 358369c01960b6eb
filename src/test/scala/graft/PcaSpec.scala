package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** PCA over the embedding column: planted-structure recovery,
  * orthonormality, and the decimal-sum determinism contract. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic planted rank-2 data in R^8: x = a·u + b·v + mean,
  // u ⟂ v unit vectors, coefficients from an integer lattice so every
  // double is exact
  private val u = Array(0.5, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0)
  private val v = Array(0.0, 0.0, 0.0, 0.0, 0.5, 0.5, 0.5, 0.5)
  private val mean = Array(1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0)
  private def planted = (0 until 200).map { i =>
    val a = (i % 7 - 3).toDouble   // variance along u
    val b = (i % 3 - 1).toDouble * 4.0 // larger variance along v
    (i.toLong, (0 until 8).map(j => (a * u(j) + b * v(j) + mean(j)).toFloat).toArray)
  }.toDF("vec_id", "embedding")

  test("pcaFit recovers a planted rank-2 subspace") {
    val m = Embeddings.pcaFit(planted, k = 8)
    assert(m.n == 200L)
    // trailing 6 eigenvalues vanish; leading 2 carry all variance
    m.eigenvalues.drop(2).foreach(ev => assert(math.abs(ev) < 1e-9, m.eigenvalues.mkString(",")))
    assert(m.explained.take(2).sum > 1.0 - 1e-9)
    // eigenvalues sorted descending
    m.eigenvalues.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-12))
    // mean recovered exactly (lattice coefficients sum to zero-mean
    // offsets only through a and b, which average to 0 and 0)
    val aBar = (0 until 200).map(i => (i % 7 - 3).toDouble).sum / 200.0
    val bBar = (0 until 200).map(i => (i % 3 - 1).toDouble * 4.0).sum / 200.0
    (0 until 8).foreach { j =>
      assert(math.abs(m.mean(j) - (mean(j) + aBar * u(j) + bBar * v(j))) < 1e-9)
    }
    // top-2 components span {u, v}: projecting u and v onto the
    // component plane loses nothing
    Seq(u, v).foreach { w =>
      val c0 = (0 until 8).map(j => w(j) * m.components(0)(j)).sum
      val c1 = (0 until 8).map(j => w(j) * m.components(1)(j)).sum
      assert(math.abs(c0 * c0 + c1 * c1 - 1.0) < 1e-9, s"span loss for ${w.mkString(",")}")
    }
  }

  test("components are orthonormal and reconstruction is exact on planted data") {
    val m = Embeddings.pcaFit(planted, k = 2)
    for (a <- 0 until 2; b <- 0 until 2) {
      val dot = (0 until 8).map(j => m.components(a)(j) * m.components(b)(j)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"<c$a,c$b> = $dot")
    }
    // x̂ = mean + Σ proj_c · comp_c must reproduce rank-2 rows exactly
    val proj = Embeddings.pcaProject(planted, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    orig.foreach { case (id, x) =>
      val p = proj(id)
      (0 until 8).foreach { j =>
        val rec = m.mean(j) + p(0) * m.components(0)(j) + p(1) * m.components(1)(j)
        assert(math.abs(rec - x(j)) < 1e-9, s"vec $id dim $j: $rec vs ${x(j)}")
      }
    }
  }

  test("model is partitioning-independent (decimal moment sums)") {
    val emb = graft.tables.Tables.embeddings(spark, sf)
    val m1 = Embeddings.pcaFit(emb, k = 4)
    val m2 = Embeddings.pcaFit(emb.repartition(7), k = 4)
    assert(m1.n == m2.n)
    assert(m1.mean.sameElements(m2.mean))
    assert(m1.eigenvalues.sameElements(m2.eigenvalues))
    (0 until 4).foreach(c => assert(m1.components(c).sameElements(m2.components(c))))
  }

  test("eigenvalue trace matches independently computed per-dim variance (sf)") {
    val emb = graft.tables.Tables.embeddings(spark, sf)
    val m = Embeddings.pcaFit(emb, k = 64)
    val varRow = emb.select((0 until 64).map(j =>
      var_pop(element_at(col("embedding"), j + 1).cast("double")).as(s"v$j")): _*).head()
    val varSum = (0 until 64).map(varRow.getDouble).sum
    assert(math.abs(m.eigenvalues.sum - varSum) < 1e-6 * math.max(1.0, varSum),
      s"${m.eigenvalues.sum} vs $varSum")
    m.eigenvalues.foreach(ev => assert(ev > -1e-9))
  }
}
