package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.storage.TxLog

/** Scale evidence for the write-time governance layer (CHECK
  * constraints): the enforcement probe runs over the INCOMING batch
  * only — one codegen'd filter evaluating every constraint in a
  * single job — so its cost must be
  *
  *  1. TABLE-SIZE-INVARIANT: appending the same batch to a 10× bigger
  *     constrained table costs the same (enforcement never reads the
  *     table — only `addConstraint` itself scans existing data, once).
  *  2. BATCH-LINEAR: a 10× bigger batch costs ~10× (one pass).
  *  3. CONSTRAINT-COUNT-CHEAP: 8 constraints vs 1 in the same probe
  *     job cost nearly the same (all flags fuse into one codegen'd
  *     projection over one scan).
  *
  * Timings print per append; the commit (stage + rename) dominates the
  * absolute number, so each tier also times the pure probe via a
  * refused commit (violating batch — probe runs, nothing stages).
  */
object ScaleCheckGov {

  private def time[A](name: String)(f: => A): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[scale-gov] $name%-52s $s%8.2f s")
    s
  }

  private def rmrf(d: String): Unit = {
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete()
    }
    rm(new java.io.File(d))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scale-gov")
    import spark.implicits._
    val root = "/tmp/graft_scalegov"
    rmrf(root)

    def mk(n: Long) = spark.range(n)
      .select(col("id").as("k"), (col("id") % 16).cast("string").as("part"),
        (col("id") % 1000 + 1).cast("double").as("v"))
    // exactly ONE violating row, planted last — the probe's limit(1)
    // cannot short-circuit, so the timing is the honest full pass
    def bad(n: Long) = mk(n)
      .withColumn("v", when(col("k") === (n - 1), lit(-1.0)).otherwise(col("v")))

    // tables at 1x (0.6M rows) and 10x (6M rows), same constraint set;
    // k rides the skip index — range ingest gives files disjoint k
    // ranges, the layout the pruned UNIQUE probe and the file-granular
    // merge exploit
    val t1 = s"$root/t1"; val t10 = s"$root/t10"
    TxLog.create(mk(600000L), t1, Some("part"), statsCols = Seq("k"))
    TxLog.create(mk(6000000L), t10, Some("part"), statsCols = Seq("k"))
    Seq(t1, t10).foreach { p =>
      TxLog.addConstraint(spark, p, "v_pos", "v > 0")
      TxLog.addConstraint(spark, p, "k_set", "k IS NOT NULL")
    }

    def probeOnly(path: String, batch: org.apache.spark.sql.DataFrame): Unit =
      try { TxLog.append(batch, path); sys.error("batch should have refused") }
      catch { case _: TxLog.ConstraintViolationException => () }

    // 1. table-size invariance: same 100k batch, 1x vs 10x table
    val b100k = bad(100000L).cache(); b100k.count()
    time("probe 100k batch on 0.6M-row table") { probeOnly(t1, b100k) }
    time("probe 100k batch on 6M-row table (must be flat)") { probeOnly(t10, b100k) }

    // 2. batch linearity: 100k vs 1M batch on the same table
    val b1m = bad(1000000L).cache(); b1m.count()
    time("probe 1M batch on 0.6M-row table (~linear)") { probeOnly(t1, b1m) }

    // 3. constraint-count cost: 8 rules vs 2, same 1M batch, one job
    (1 to 6).foreach(i =>
      TxLog.addConstraint(spark, t1, s"extra_$i", s"v <> ${-i - 1}"))
    time("probe 1M batch under 8 constraints (flat vs 2)") { probeOnly(t1, b1m) }

    // 4. the full passing append for context (commit cost dominates).
    // Fresh keys, so the table stays duplicate-free for the UNIQUE
    // constraint added in step 5
    def freshKeys0(lo: Long, n: Long) = spark.range(lo, lo + n)
      .select(col("id").as("k"), (col("id") % 16).cast("string").as("part"),
        lit(1.0).as("v"))
    val good = freshKeys0(300000000L, 100000L).cache(); good.count()
    time("passing 100k append incl. commit, 6M-row table") {
      TxLog.append(good, t10)
    }

    // 5. the UNIQUE probe — the one governance check that touches the
    // table. With the key on the skip index the vs-table probe is
    // FILE-PRUNED: the batch's key bounds admit only files whose
    // min/max overlap, so a disjoint-range insert (the ingest common
    // case: new ids beyond the old max) probes ZERO files and the cost
    // is TABLE-SIZE-FLAT. Unclustered keys degrade to the documented
    // column-pruned key scan — measured last.
    Seq(t1, t10).foreach(p => TxLog.addUniqueConstraint(spark, p, "pk_k", Seq("k")))
    def freshKeys(lo: Long, n: Long) = freshKeys0(lo, n)
    val f1 = freshKeys(100000000L, 100000L).cache(); f1.count()
    val a = time("UNIQUE probe + append 100k fresh keys, 0.6M-row table") {
      TxLog.append(f1, t1)
    }
    val f2 = freshKeys(200000000L, 100000L).cache(); f2.count()
    val b = time("UNIQUE probe + append 100k disjoint keys, 6M-row table (file-pruned: flat)") {
      TxLog.append(f2, t10)
    }
    println(f"[scale-gov] unique-probe 10x-table ratio (pruned)           ${b / a}%8.2f x")

    // 6. FILE-granular merge: a 1-key merge's rewrite set is the
    // file(s) actually holding the key — cost tracks matched-file
    // bytes, never partition bytes (r8 verdict's top item)
    val vPre = TxLog.currentVersion(spark, t10).get
    val mPre = TxLog.manifest(spark, t10, vPre)
    val oneKey = Seq((100L, "4", 5.0)).toDF("k", "part", "v")
    time("1-key merge into 6M-row table (file-granular rewrite)") {
      TxLog.mergeInto(t10, oneKey, Seq("k"))
    }
    val mPost = TxLog.manifest(spark, t10, vPre + 1)
    val removed = mPre.files.toSet.diff(mPost.files.toSet)
    val partFiles = mPre.files.count(_.startsWith("part=4/"))
    println(s"[scale-gov] 1-key merge rewrote ${removed.size} of " +
      s"$partFiles files in the touched partition " +
      s"(partition-granular would rewrite all $partFiles)")

    // 7. DELETION VECTORS vs rewrite: the same 1-key delete, both
    // modes, same 6M-row table — the DV commit must cost METADATA
    // (one delete-sized sidecar), the rewrite mode one file's bytes
    time("1-key DELETE, rewrite mode (1 admitting file)") {
      TxLog.deleteWhere(spark, t10, col("k") === 200L)
    }
    val mMid = TxLog.manifest(spark, t10,
      TxLog.currentVersion(spark, t10).get)
    time("1-key DELETE, deletion-vector mode (zero file changes)") {
      TxLog.deleteWhere(spark, t10, col("k") === 300L, deletionVectors = true)
    }
    val mDv = TxLog.manifest(spark, t10,
      TxLog.currentVersion(spark, t10).get)
    println(s"[scale-gov] DV delete changed ${
      mMid.files.toSet.diff(mDv.files.toSet).size} files " +
      s"(rewrite mode rewrote ${
        if (mMid.files.toSet == mDv.files.toSet) "1 file earlier" else "?"}), " +
      s"dv rows ${mDv.dv.flatMap(_._2.values).sum}")
    time("full read AFTER the DV delete (anti-join seam cost)") {
      TxLog.read(spark, t10).count()
    }

    // 5b. the degraded bound: same probe with the skip index dropped —
    // the full column-pruned key scan an unclustered layout pays
    TxLog.setStatsCols(spark, t10, Nil)
    val f3 = freshKeys(400000000L, 100000L).cache(); f3.count()
    time("UNIQUE probe + append 100k keys, 6M-row table, NO skip index (key-scan bound)") {
      TxLog.append(f3, t10)
    }
    spark.stop()
  }
}
