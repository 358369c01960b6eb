package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Scale harness for SemDeDup (`Dedup.semanticDedup`): the scaladoc
  * claims pair work is N · cellSize when `nlist` is sized for a fixed
  * target cell — i.e. LINEAR in the corpus once the cell size is
  * pinned, with the KMeans fit a bounded constant (sample-capped).
  * This measures it instead of asserting it: the same operator over N
  * and 10N synthetic vectors, nlist = N/256 both times, with planted
  * exact twins verifying recall does not degrade as the corpus grows.
  *
  * Deterministic corpus: embedding(i)_j = xxhash64(i, j)-derived
  * uniform values — fixed, seedless (ScaleChecks must reproduce
  * run-to-run), and effectively random, so two DISTINCT vectors'
  * cosine concentrates near 0 and can never cross tau = 0.999 (a
  * sin-based lattice was tried first and aliased into real near-dup
  * chains — good data, wrong fixture). Twins are exact copies
  * (cosine 1, same argmin cell by construction), so every planted
  * pair MUST collapse at any scale. Usage:
  * `sbt "runMain graft.tools.ScaleCheckSemantic"` (arg overrides N). */
object ScaleCheckSemantic {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalesem")
    val base = args.headOption.map(_.toLong).getOrElse(50000L)
    val dim = 32
    val TwinBase = 1000000000L

    def corpus(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> cast(pmod(xxhash64(id, j), 2000) - 1000 as double) / 1000.0)")
          .as("embedding"))

    def planted(n: Long): DataFrame = {
      val c = corpus(n)
      c.unionByName(c.filter(col("vec_id") < n / 100)
        .select((col("vec_id") + TwinBase).as("vec_id"), col("embedding")))
    }

    def run(n: Long): (Double, Long, Long) = {
      val emb = planted(n)
      val nlist = math.max(4, (n / 256).toInt)
      val t0 = System.nanoTime()
      val out = Dedup.semanticDedup(emb, tau = 0.999, nlist = nlist)
      // every planted twin pair must collapse to one survivor: for
      // each (base, twin) pair exactly one side keeps
      val pairKept = out
        .filter(col("vec_id") >= TwinBase || col("vec_id") < n / 100)
        .withColumn("pair",
          when(col("vec_id") >= TwinBase, col("vec_id") - TwinBase)
            .otherwise(col("vec_id")))
        .groupBy("pair")
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      val badPairs = pairKept.filter(col("kept") =!= 1L).count()
      val dropped = out.filter(!col("keep")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      require(badPairs == 0L,
        s"semantic twin recall broke at n=$n: $badPairs pairs without " +
          "exactly one survivor")
      (secs, dropped, n / 100)
    }

    run(math.max(1000L, base / 10)) // JIT + codegen warmup tier
    val (t1, d1, p1) = run(base)
    val (t10, d10, p10) = run(base * 10)
    println(f"[scalesem] n=$base%8d  ${t1}%6.1f s  dropped=$d1 (planted $p1)")
    println(f"[scalesem] n=${base * 10}%8d  ${t10}%6.1f s  dropped=$d10 (planted $p10)")
    println(f"[scalesem] 10x data -> ${t10 / t1}%4.1fx time " +
      "(fixed cell size: expect ~linear; the KMeans fit is the " +
      "sample-capped constant term)")

    // ---- incremental path: a FIXED batch appended to an indexed
    // corpus at N and 10N — cost must track the BATCH (touched cells ×
    // cell size; both pinned), not the corpus; recall stays exact at
    // both scales. The batch stays BELOW the smaller corpus's nlist so
    // "touched cells ≤ batch" holds at both scales — a batch larger
    // than nlist touches every cell and the comparison degenerates to
    // the full-recompute one above. ----
    val batchSize = base / 500
    def runAppend(n: Long): Double = {
      val c = corpus(n)
      val nlist = math.max(4, (n / 256).toInt)
      val path = java.nio.file.Files
        .createTempDirectory("scalesem_idx").toString
      Dedup.semanticDedupInit(c, path, tau = 0.999, nlist = nlist)
      val batch = c.filter(col("vec_id") < batchSize)
        .select((col("vec_id") + TwinBase).as("vec_id"), col("embedding"))
      val t0 = System.nanoTime()
      Dedup.semanticDedupAppend(spark, path, batch, tau = 0.999)
      val secs = (System.nanoTime() - t0) / 1e9
      // recall OUTSIDE the timed window (the state read is corpus-sized)
      val out = Dedup.semanticDedupAppend(spark, path,
        batch.filter(col("vec_id") < 0), tau = 0.999)
      val badPairs = out
        .filter(col("vec_id") >= TwinBase || col("vec_id") < batchSize)
        .withColumn("pair",
          when(col("vec_id") >= TwinBase, col("vec_id") - TwinBase)
            .otherwise(col("vec_id")))
        .groupBy("pair")
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
        .filter(col("kept") =!= 1L).count()
      require(badPairs == 0L,
        s"append twin recall broke at n=$n: $badPairs pairs without " +
          "exactly one survivor")
      secs
    }
    val a1 = runAppend(base)
    val a10 = runAppend(base * 10)
    println(f"[scalesem] append batch=$batchSize onto n=$base%8d  ${a1}%6.1f s")
    println(f"[scalesem] append batch=$batchSize onto n=${base * 10}%8d  ${a10}%6.1f s")
    println(f"[scalesem] 10x corpus, same batch -> ${a10 / a1}%4.1fx append time " +
      "(touched-cell rework: expect ~flat — cost tracks the batch, " +
      "not the corpus)")
    spark.stop()
  }
}
