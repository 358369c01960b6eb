package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Pq, Similarity}
import graft.tables.Tables

/** Recall@k of the approximate-NN paths against brute-force ground
  * truth — the quantitative quality gate a user tuning tables/planes
  * (LSH) or nlist/nprobe (IVF) reads. Floors are set from measured
  * values on the sf0.001 embeddings (weakly-similar random data — the
  * HARD case for ANN; clustered production embeddings do better);
  * measured numbers are recorded in SURVEY.md §6c.
  */
class AnnRecallSpec extends SparkSpec {

  private val k = 10
  private val qids: Seq[Long] = (0L until 20L).toSeq
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val exact = Similarity.cosineTopKBatch(emb, qids, k).cache()

  private def mean(approx: DataFrame): Double =
    Similarity.recallAtK(exact, approx).agg(avg("recall")).head().getDouble(0)

  test("batched ground truth agrees with the single-query operator") {
    val single = Similarity.cosineTopK(emb, queryId = 3L, k = k)
      .collect().map(_.getLong(0)).toSet
    val batched = exact.filter(col("qid") === 3L)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet
    assert(single == batched, s"batch ground truth diverged: $single vs $batched")
  }

  test("IVF recall@10: exhaustive probe is exact, nprobe grows recall, nprobe=4 holds the floor") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_recall").toString
    val index = Ivf.fit(emb, tmp, nlist = 16)
    val r16 = mean(Ivf.queryBatch(spark, index, emb, qids, k, nprobe = 16))
    val r4 = mean(Ivf.queryBatch(spark, index, emb, qids, k, nprobe = 4))
    val r1 = mean(Ivf.queryBatch(spark, index, emb, qids, k, nprobe = 1))
    info(f"IVF recall@10 (nlist=16): nprobe=1 $r1%.3f, nprobe=4 $r4%.3f, nprobe=16 $r16%.3f")
    // probing every cell IS brute force — recall must be exactly 1
    assert(r16 == 1.0, s"exhaustive nprobe=nlist recall was $r16, not 1.0")
    assert(r4 >= r1, s"recall did not grow with nprobe: nprobe=4 $r4 < nprobe=1 $r1")
    // measured 0.645 on this corpus (deterministic: fixed data, seed,
    // centroids) — scanning 1/4 of a structureless corpus more than
    // doubles the 1/4-of-corpus baseline a random probe would score
    assert(r4 >= 0.60, s"IVF recall@10 at nprobe=4/nlist=16 below floor: $r4")
  }

  test("spilled IVF (multi-assignment): recall at fixed nprobe beats single-assignment, exhaustive still exact") {
    val base = java.nio.file.Files.createTempDirectory("graft_ann_spill").toString
    val single = Ivf.fit(emb, s"$base/s1", nlist = 16)
    val spilled = Ivf.fit(emb, s"$base/s2", nlist = 16, spill = 2)
    // the load path round-trips the spill factor from the meta sidecar
    assert(Ivf.load(spark, s"$base/s2").spill == 2, "spill did not persist")
    assert(Ivf.load(spark, s"$base/s1").spill == 1)
    val r4s1 = mean(Ivf.queryBatch(spark, single, emb, qids, k, nprobe = 4))
    val r4s2 = mean(Ivf.queryBatch(spark, spilled, emb, qids, k, nprobe = 4))
    val r16 = mean(Ivf.queryBatch(spark, spilled, emb, qids, k, nprobe = 16))
    info(f"IVF recall@10 at nprobe=4: spill=1 $r4s1%.3f, spill=2 $r4s2%.3f (exhaustive spill=2: $r16%.3f)")
    // a vector's own cell is always among its spill homes, so probing
    // every cell sees every vector — and the vec_id dedup keeps the
    // duplicate copies out of top-k: exhaustive must be exactly 1.0
    assert(r16 == 1.0, s"exhaustive probe on the spilled index was $r16, not 1.0")
    assert(r4s2 >= r4s1,
      s"spill=2 did not help at nprobe=4: $r4s2 < single-assignment $r4s1")
    // measured on this corpus (deterministic): the floor pins the gain
    assert(r4s2 >= 0.75, s"spilled-IVF recall@10 at nprobe=4 below floor: $r4s2")
    // top-k must never contain a vec_id twice (the dedup contract)
    val qv = emb.filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val rows = Ivf.query(spark, spilled, qv, k,
      nprobe = 4, excludeId = Some(3L)).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "duplicate vec_id in spilled-index top-k")
  }

  test("IVF-PQ on a spilled index: best-ADC-per-id collapse, recall above single-assignment, exhaustive exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_spill").toString
    val index = Ivf.fit(emb, tmp, nlist = 16, spill = 2)
    val model = Pq.fitResidual(spark, index)
    Pq.encodeIvf(spark, index, model)
    // serving knobs (nprobe=8, shortlist=100): the spilled IVF term
    // lifts the composition above the single-assignment 0.825 (§6c)
    val rDef = mean(Pq.ivfQueryBatch(spark, index, model, emb, qids, k))
    info(f"IVF-PQ recall@10, spill=2 (nlist=16, nprobe=8, shortlist=100): $rDef%.3f")
    // measured 0.970 (deterministic: fixed data, seed, centroids)
    assert(rDef >= 0.90, s"spilled IVF-PQ recall@10 at default knobs below floor: $rDef")
    // exhaustive knobs stay exactly brute force — duplicates collapse
    // in BOTH the ADC shortlist and the re-rank, or this would differ
    val rAll = mean(Pq.ivfQueryBatch(spark, index, model, emb, qids, k,
      nprobe = 16, shortlist = 500))
    assert(rAll == 1.0, s"exhaustive spilled IVF-PQ recall was $rAll, not 1.0")
    // no duplicate ids in a served top-k
    val qv = emb.filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val rows = Pq.ivfQuery(spark, index, model, qv, k, excludeId = Some(3L))
      .collect()
    assert(rows.length == k &&
      rows.map(_.getLong(0)).distinct.length == rows.length,
      "duplicate vec_id in spilled IVF-PQ top-k")
  }

  test("LSH recall@10: grows with tables, DEFAULT knobs hold a 0.6 floor, matches single-query path") {
    val n = emb.count()
    val r2 = mean(Similarity.annLshBatch(emb, qids, k, tables = 2, n = n))
    val r4 = mean(Similarity.annLshBatch(emb, qids, k, tables = 4, n = n))
    val rDefault = mean(Similarity.annLshBatch(emb, qids, k, n = n))
    info(f"LSH recall@10 (planes=${Similarity.planesFor(n)}): tables=2 $r2%.3f, tables=4 $r4%.3f, default(tables=8) $rDefault%.3f")
    assert(rDefault >= r4 && r4 >= r2,
      s"recall not monotone in tables: t2=$r2 t4=$r4 t8=$rDefault")
    // measured 0.385 / 0.630 (deterministic planes + data). Random
    // near-orthogonal vectors are hyperplane LSH's worst case — each
    // extra table buys ~60% more recall here; the clustered test below
    // shows the high-recall regime the operator is actually for. The
    // DEFAULT knobs (tables=8, sized planes) must clear 0.6 — the
    // scaladoc's documented contract for out-of-the-box serving; the
    // higher-recall serving path remains IVF (0.97 at nprobe=4 above).
    assert(r4 >= 0.35, s"LSH recall@10 at tables=4 below floor: $r4")
    assert(rDefault >= 0.60,
      s"LSH recall@10 at DEFAULT knobs below documented floor: $rDefault")
    // the batch probe is the same bucket math as the shipped annLsh
    val single = Similarity.annLsh(emb, queryId = 5L, k = k, n = n)
      .collect().map(_.getLong(0)).toSet
    val batched = Similarity.annLshBatch(emb, Seq(5L), k, n = n)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet
    assert(single == batched, s"batch LSH diverged from annLsh: $single vs $batched")
  }

  test("PQ recall@10: exhaustive shortlist IS brute force, recall grows with shortlist") {
    val model = Pq.fit(emb)
    val rAll = mean(Pq.queryBatch(emb, model, qids, k, shortlist = 500))
    val r100 = mean(Pq.queryBatch(emb, model, qids, k, shortlist = 100))
    val r25 = mean(Pq.queryBatch(emb, model, qids, k, shortlist = 25))
    info(f"PQ recall@10 (m=8, ksub=16): shortlist=25 $r25%.3f, 100 $r100%.3f, 500 $rAll%.3f")
    // shortlist = N re-ranks every vector with exact cosine — brute force
    assert(rAll == 1.0, s"exhaustive shortlist recall was $rAll, not 1.0")
    assert(r100 >= r25, s"recall did not grow with shortlist: $r100 < $r25")
    // measured 0.790 on this corpus (deterministic: fixed data, seed,
    // codebooks) — a 100-of-500 shortlist through 8-byte codes recovers
    // ~4x what a random 20% shortlist would; SURVEY §6c records the sweep
    assert(r100 >= 0.70, s"PQ recall@10 at shortlist=100 below floor: $r100")
  }

  test("IVF-PQ composition: pruned code scan, exhaustive knobs recover brute force exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val index = Ivf.fit(emb, tmp, nlist = 16)
    val model = Pq.fitResidual(spark, index)
    Pq.encodeIvf(spark, index, model)
    // the 100 TB property: the ADC scan lists only the nprobe code
    // partitions — m-byte rows AND nprobe/nlist of the corpus
    val codeScan = spark.read.parquet(s"$tmp/codes")
      .filter(col("cell").isin(0, 1, 2, 3))
    val scans = codeScan.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.selectedPartitions.partitionCount == 4,
      "code scan not pruned to the probed cells")
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val q = Pq.ivfQuery(spark, index, model, qv, k, nprobe = 4,
      excludeId = Some(0L))
    assert(q.count() == k)
    // exhaustive knobs (probe every cell, shortlist = N) ⇒ brute force
    val rAll = mean(Pq.ivfQueryBatch(spark, index, model, emb, qids, k,
      nprobe = 16, shortlist = 500))
    assert(rAll == 1.0, s"exhaustive IVF-PQ recall was $rAll, not 1.0")
    // recall factors as IVF(nprobe) x PQ(shortlist). The PQ stage IN
    // ISOLATION: probe every cell (IVF term = 1) with the serving
    // shortlist — RESIDUAL codes (v̂ − centroid, the standard IVF-PQ
    // formulation, ksub=64 default) must be near-lossless here. The
    // r7 raw-vector codes measured 0.790 on this sweep; residual
    // ksub=16 measures 0.870, residual ksub=64 0.950
    val rPq = mean(Pq.ivfQueryBatch(spark, index, model, emb, qids, k,
      nprobe = 16, shortlist = 100))
    info(f"residual-PQ stage alone (nprobe=16, shortlist=100): $rPq%.3f")
    assert(rPq >= 0.9, s"residual-PQ shortlist stage below floor: $rPq")
    // composed serving knobs are CAPPED by the IVF term (0.645 at
    // nprobe=4 — an unprobed cell is lost before ADC ever runs, so no
    // code quality can beat the cap); residual codes must hand back
    // essentially all of it
    val rIvf4 = mean(Ivf.queryBatch(spark, index, emb, qids, k, nprobe = 4))
    val r = mean(Pq.ivfQueryBatch(spark, index, model, emb, qids, k,
      nprobe = 4, shortlist = 100))
    info(f"IVF-PQ recall@10 (nlist=16, nprobe=4, m=8, shortlist=100): $r%.3f (IVF cap $rIvf4%.3f)")
    assert(r >= rIvf4 - 0.05,
      s"PQ shortlist lost more than 0.05 off the IVF cap: $r vs $rIvf4")
    // DEFAULT serving knobs (nprobe=8, shortlist=100 — the scaladoc's
    // contract): residual codes hand back essentially the whole IVF
    // term, so the default must clear 0.8 (measured 0.825)
    val rDefault = mean(Pq.ivfQueryBatch(spark, index, model, emb, qids, k))
    info(f"IVF-PQ recall@10 at DEFAULT knobs (nprobe=8): $rDefault%.3f")
    assert(rDefault >= 0.80,
      s"IVF-PQ recall@10 at DEFAULT knobs below documented floor: $rDefault")
  }

  test("clustered corpus (ANN's design regime): both paths recall >= 0.9 at default knobs") {
    import spark.implicits._
    // 50 planted clusters x 20 near-copies: every query's true top-10
    // is its cluster siblings — the structure ANN indexes exploit
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(50)(Array.fill(16)(rnd.nextDouble() * 2 - 1))
    val rows = for (c <- 0 until 50; i <- 0 until 20) yield {
      val v = centers(c).map(x => (x + (rnd.nextDouble() - 0.5) * 0.1).toFloat)
      ((c * 20 + i).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cq: Seq[Long] = (0 until 20).map(c => (c * 20).toLong)
    val truth = Similarity.cosineTopKBatch(corpus, cq, k).cache()
    def meanC(approx: DataFrame): Double =
      Similarity.recallAtK(truth, approx).agg(avg("recall")).head().getDouble(0)
    val lsh = meanC(Similarity.annLshBatch(corpus, cq, k, dim = 16, tables = 4, n = 1000L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_clustered").toString
    val index = Ivf.fit(corpus, tmp, nlist = 16)
    val ivf = meanC(Ivf.queryBatch(spark, index, corpus, cq, k, nprobe = 4))
    info(f"clustered corpus recall@10: LSH(tables=4) $lsh%.3f, IVF(nprobe=4/nlist=16) $ivf%.3f")
    assert(lsh >= 0.9, s"LSH recall@10 on clustered corpus below 0.9: $lsh")
    assert(ivf >= 0.9, s"IVF recall@10 on clustered corpus below 0.9: $ivf")
    truth.unpersist()
  }

  test("annJoin pair recall ledger: tables=4 vs 8 measured, DEFAULT knob contract pinned") {
    import spark.implicits._
    // 200 left vectors, each with a perturbed twin on the right
    // (cosine ~0.99): ground truth = EVERY cross pair clearing the
    // cosine bar, computed brute-force
    val rnd = new scala.util.Random(7)
    val leftRows = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
    // heavy perturbation puts the true pairs NEAR the bar — the
    // adversarial regime where bucket-sign agreement is not a given
    val rightRows = leftRows.map { case (i, v) =>
      (1000L + i, v.map(x => (x + (rnd.nextDouble() - 0.5) * 0.7).toFloat))
    }
    val left = leftRows.toDF("vec_id", "embedding")
    val right = rightRows.toDF("vec_id", "embedding")
    val bar = 0.80
    val truth = left.select(col("vec_id").as("left_id"), col("embedding").as("e_l"))
      .crossJoin(right.select(col("vec_id").as("right_id"), col("embedding").as("e_r")))
      .filter(Similarity.cosine(col("e_l"), col("e_r")) >= bar)
      .select("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 100, s"fixture degenerate: only ${truth.size} true pairs")
    def found(tables: Int): Set[(Long, Long)] =
      Similarity.annJoin(left, right, minCosine = bar, dim = 16, tables = tables,
          planes = 12)
        .select("left_id", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val f4 = found(4); val f8 = found(8)
    // exact-verify downstream: NO false pairs at any knob
    assert(f4.subsetOf(truth) && f8.subsetOf(truth),
      "annJoin emitted a pair below the cosine bar")
    val r4 = f4.size.toDouble / truth.size
    val r8 = f8.size.toDouble / truth.size
    info(f"annJoin pair recall (planted twins, bar=$bar): tables=4 $r4%.3f, tables=8 $r8%.3f")
    assert(r8 >= r4 - 1e-9, s"recall not monotone in tables: t4=$r4 t8=$r8")
    // measured 0.700 / 0.882 (deterministic: seeded fixture, fixed
    // planes) — the DEFAULT (tables=4) contract the scaladoc now
    // documents: a candidate GENERATOR with exact verify downstream,
    // so precision is 1.0 by construction and missed pairs are the
    // only failure mode; doubling `tables` buys ~26% more recall for
    // 2x banding cost here
    assert(r4 >= 0.65, s"annJoin default-knob recall below documented floor: $r4")
    assert(r8 >= 0.80, s"annJoin tables=8 recall below documented floor: $r8")
  }
}
