package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.tables.Tables

/** 100x scale experiment for the flagship paths — two orders of
  * magnitude over sf0.1, because a 10x run can hide super-linear terms
  * (an O(n^1.3) stage reads as "a bit slow" at 10x and as a wall at
  * 100x). Each path is timed at 1x / 10x / 100x with the SAME data
  * shape per tier, so the two successive ratios give a direct
  * flat / linear / super-linear reading:
  *
  *  - `jaccard_join`: a SYNTHETIC controlled-overlap corpus (30 unique
  *    tokens per doc; every 10th doc gets a twin sharing 27 of 30 —
  *    jaccard 27/33 ≈ 0.82) scaled 1x/10x/100x by doc count. The sf0.1
  *    documents table is unusable for a scale reading here: its
  *    planted near-dup cliques are thousands of docs wide, so the
  *    qualifying OUTPUT is ~5M pairs at 5k docs (measured) — the
  *    count would time clique-quadratic pair materialization, a data
  *    pathology, not the operator. The synthetic shape keeps output
  *    linear (n/10 pairs) so the reading is candidate generation +
  *    verification, which is what must scale.
  *  - `dedup_components`: synthetic chain-forests with FIXED chain
  *    length (64) and 100x the chains — diameter constant, edge count
  *    scales, so rounds stay put and per-round cost must track edges.
  *  - `bm25_indexed`: documents replicated UN-salted (shifted ids,
  *    same text) — query-term postings genuinely grow 100x, which is
  *    exactly what serving must stay proportional to (never corpus
  *    text). Build is corpus-linear by design; serving must track
  *    postings-of-query-terms, reading only their bucket partitions.
  *  - `txlog merge`: 100x lineitem into a 16-partition table, then a
  *    1/16-partition merge — merge cost must track the TOUCHED
  *    partition (~1/16 of a tier's create), not the table.
  */
object ScaleCheck100 {
  private def t(name: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[scale100] $name%-28s $s%8.2f s  rows=$n")
    s
  }

  /** copies docs `factor`x with shifted ids (same text — the bm25
    * shape, where duplicate text is exactly what grows the postings). */
  private def replicateDocs(docs: DataFrame, factor: Int, out: String): Unit = {
    if (new java.io.File(out).exists()) return
    (0 until factor)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(out)
  }

  private def chainForest(spark: SparkSession, chains: Long,
                          len: Long): DataFrame =
    // chain c holds nodes [c*len, (c+1)*len); edge i -> i+1 within it
    spark.range(chains * len)
      .filter((col("id") + 1) % len =!= 0)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scale100")
    val d = "/root/testdata/sf0.1"
    val root = "/tmp/graft_sf100x"
    val docs = Tables.documents(spark, d)

    // ---- jaccard_join: synthetic controlled-overlap corpus ----
    // doc d's tokens: w(d*37+j), j in 0..29 (stride 37 > 29: no
    // accidental cross-doc overlap); d % 10 == 1 copies 27 of its
    // predecessor's tokens — exactly one planted pair per 10 docs
    def jjCorpus(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"),
          when(col("id") % 10 === 1 && j < 27, (col("id") - 1) * 37 + j)
            .otherwise(col("id") * 37 + j)))).as("text"))
    def jj(n: Long): Long = {
      val got = Dedup.jaccardJoin(jjCorpus(n)).count()
      assert(got == n / 10, s"expected ${n / 10} planted pairs, got $got")
      got
    }
    val j1 = t("jaccard_join 40k docs")(jj(40000L))
    val j10 = t("jaccard_join 400k docs")(jj(400000L))
    val j100 = t("jaccard_join 4M docs")(jj(4000000L))
    println(f"[scale100] jaccard ratios: 10x/1x ${j10 / j1}%.1f, 100x/10x ${j100 / j10}%.1f")

    // ---- dedup_components: constant diameter, 1M/10M/100M edges ----
    // dir-backed checkpoints (the documented cluster path): the 100M
    // tier's 2x10^8-row label/edge materializations belong on disk,
    // not in the driver-heap value store localCheckpoint uses
    def cc(chains: Long): Long = {
      val got = Dedup.components(chainForest(spark, chains, 64L),
          checkpointDir = Some(s"$root/cc_ckpt"))
        .select("component").distinct().count()
      assert(got == chains, s"expected $chains components, got $got")
      got
    }
    val c1 = t("components 1M edges")(cc(16000L))
    val c10 = t("components 10M edges")(cc(160000L))
    val c100 = t("components 100M edges")(cc(1600000L))
    println(f"[scale100] components ratios: 10x/1x ${c10 / c1}%.1f, 100x/10x ${c100 / c10}%.1f")

    // ---- bm25_indexed: un-salted replication, build + serve ----
    replicateDocs(docs, 10, s"$root/docs_plain_10x")
    replicateDocs(docs, 100, s"$root/docs_plain_100x")
    val terms = Seq("dup", "vector", "join")
    def buildAndServe(tag: String, src: Option[String]): Unit = {
      val in = src.fold(docs)(p => spark.read.parquet(p))
      val idx = s"$root/bm25_$tag"
      t(s"bm25 index build $tag") {
        graft.operators.TextOps.buildTextIndex(in, idx); 1L
      }
      t(s"bm25 serve $tag") {
        graft.operators.TextOps.bm25Indexed(spark, idx, terms, k = 50).count()
      }
    }
    buildAndServe("1x", None)
    buildAndServe("10x", Some(s"$root/docs_plain_10x"))
    buildAndServe("100x", Some(s"$root/docs_plain_100x"))

    // ---- txlog merge: 100x lineitem, 16 partitions, 1/16 merge ----
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    def txTier(tag: String, factor: Int): Unit = {
      val dir = s"$root/txlog_$tag"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val tiered = (0 until factor).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .withColumn("part", pmod(col("l_orderkey"), lit(16L)))
      t(s"txlog create $tag") {
        graft.storage.TxLog.create(tiered, dir, Some("part"))
        graft.storage.TxLog.read(spark, dir).count()
      }
      t(s"txlog merge $tag 1/16") {
        val upd = tiered.filter(col("part") === 3L && col("l_linenumber") === 1)
          .dropDuplicates("l_orderkey", "l_linenumber")
          .withColumn("l_quantity", col("l_quantity") * 2)
        graft.storage.TxLog.mergeInto(dir, upd,
          Seq("l_orderkey", "l_linenumber"), preValidated = true)
      }
    }
    txTier("1x", 1)
    txTier("10x", 10)
    txTier("100x", 100)
    spark.stop()
  }
}
