package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.queries.{ReferenceQueries, WarehouseQueries}
import graft.tables.Tables

/** 10x scale experiment: replicate sf0.1 inputs (ids re-keyed per copy)
  * and compare operator runtimes against the sf0.1 baseline. */
object ScaleCheck {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scale] $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scale")
    val d = "/root/testdata/sf0.1"
    val big = "/tmp/graft_sf1x"
    // 10 copies of lineitem / documents with shifted keys
    val li = Tables.lineitem(spark, d)
    val docs = Tables.documents(spark, d)
    if (!new java.io.File(s"$big/lineitem.parquet").exists()) {
      (0 until 10).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
      (0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
      // dims unchanged
      for (tbl <- Seq("part", "supplier", "orders", "customer", "events",
                      "region", "nation"))
        Tables.table(spark, d, tbl).write.mode("overwrite").parquet(s"$big/$tbl.parquet")
    }
    // embeddings replicate with re-keyed ids every run (cheap, and the
    // layout changed in r6): each vector repeats 10x, so every query
    // gains 9 planted exact twins ANN must surface — recall at 10x is
    // measured against brute-force ground truth on the same corpus
    (0 until 10).map(i => Tables.embeddings(spark, d)
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    // events replicate with shifted users (r7: the funnel shuffles on
    // user_id, so a 10x check needs 10x the users, not 10x per-user
    // history); written every run like embeddings — cheap
    (0 until 10).map(i => Tables.events(spark, d)
        .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$big/events.parquet")
    t("q1_agg sf0.1")(WarehouseQueries.q1Agg(spark, d).count())
    t("q1_agg 10x")(WarehouseQueries.q1Agg(spark, big).count())
    t("combined sf0.1")(ReferenceQueries.combinedView(spark, d).count())
    t("combined 10x")(ReferenceQueries.combinedView(spark, big).count())
    t("topk sf0.1")(WarehouseQueries.topkGroup(spark, d).count())
    t("topk 10x")(WarehouseQueries.topkGroup(spark, big).count())
    t("minhash sf0.1")(Dedup.minhashCandidates(Tables.documents(spark, d)).count())
    t("minhash 10x")(Dedup.minhashCandidates(Tables.documents(spark, big)).count())
    t("exact sf0.1")(Dedup.exact(Tables.documents(spark, d)).count())
    t("exact 10x")(Dedup.exact(Tables.documents(spark, big)).count())
    val strat = (dir: String) => graft.operators.Sampling.stratified(
      Tables.documents(spark, dir).select("doc_id", "text"),
      pmod(length(col("text")), lit(4)), 0.25)
    t("stratified sf0.1")(strat(d).count())
    t("stratified 10x")(strat(big).count())
    val pack = (dir: String) => graft.operators.Packing.packSequences(
      Tables.documents(spark, dir), size(split(col("text"), " ")), 2048)
    t("pack sf0.1")(pack(d).count())
    t("pack 10x")(pack(big).count())
    t("vocab sf0.1")(graft.operators.TextOps.vocab(Tables.documents(spark, d)).count())
    t("vocab 10x")(graft.operators.TextOps.vocab(Tables.documents(spark, big)).count())
    t("sweep sf0.1")(Dedup.sweep(Tables.documents(spark, d)).count())
    t("sweep 10x")(Dedup.sweep(Tables.documents(spark, big)).count())
    t("rangejoin sf0.1")(WarehouseQueries.rangeJoinQuery(spark, d).count())
    t("rangejoin 10x")(WarehouseQueries.rangeJoinQuery(spark, big).count())
    val shuf = (dir: String) => graft.operators.Sampling.deterministicShuffle(
      Tables.documents(spark, dir).select("doc_id"))
    t("shuffle sf0.1")(shuf(d).count())
    t("shuffle 10x")(shuf(big).count())
    val batch = (dir: String) => graft.operators.Packing.lengthBuckets(
      Tables.documents(spark, dir), size(split(col("text"), " ")), 16, 8)
    t("lenbatch sf0.1")(batch(d).count())
    t("lenbatch 10x")(batch(big).count())
    // r6 additions
    val salted = (dir: String) => graft.operators.Sampling.weighted(
      Tables.documents(spark, dir).select("doc_id", "text"),
      pmod(length(col("text")), lit(4)),
      Map[Any, Double]("0" -> 0.5, "1" -> 0.25), defaultFrac = 0.125, salts = 8)
    t("salted sample sf0.1")(salted(d).count())
    t("salted sample 10x")(salted(big).count())
    val audit = (dir: String) => graft.operators.Upsert.pkViolations(
      Tables.lineitem(spark, dir), Seq("l_orderkey", "l_linenumber"))
    t("pk audit sf0.1")(audit(d).count())
    t("pk audit 10x")(audit(big).count())
    val zq = (dir: String, out: String) => {
      graft.operators.Layout.zorderByQuantiles(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", out, numFiles = 32, bits = 6)
      spark.read.parquet(out).count()
    }
    t("zorder quantile sf0.1")(zq(d, "/tmp/graft_zq_01"))
    t("zorder quantile 10x")(zq(big, "/tmp/graft_zq_10x"))
    val decon = (dir: String) => {
      val docs = Tables.documents(spark, dir)
      val bench = docs
        .filter(col("doc_id") % 100 === 0 && size(split(col("text"), " ")) >= 15)
        .select(concat_ws(" ", slice(split(col("text"), " "), 3, 13)).as("text"))
      graft.operators.TextOps.decontaminateNgrams(docs, bench, n = 13)
    }
    t("ngram decon sf0.1")(decon(d).count())
    t("ngram decon 10x")(decon(big).count())
    val rep = (dir: String) =>
      graft.operators.TextOps.repetition(Tables.documents(spark, dir))
    t("repetition sf0.1")(rep(d).count())
    t("repetition 10x")(rep(big).count())
    // 10x lineitem carries shifted keys, so only the original copy can
    // join — the bloom probe drops the other 90% at scan time, which is
    // exactly the reduction the operator exists for
    t("bloom join sf0.1")(WarehouseQueries.bloomJoinQuery(spark, d).count())
    t("bloom join 10x")(WarehouseQueries.bloomJoinQuery(spark, big).count())
    val prof = (dir: String) => graft.operators.Profile.profile(
      Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    t("profile sf0.1")(prof(d).count())
    t("profile 10x")(prof(big).count())
    // batch-vs-corpus: the batch stays constant, the corpus banding 10x —
    // candidate work scales with bucket occupancy, not corpus self-pairs
    val inc = (dir: String) => {
      val docs = Tables.documents(spark, dir)
      val batch = docs.filter(col("doc_id") % 1000000L < 5)
        .select((col("doc_id") + 500000000L).as("doc_id"), col("text"))
      Dedup.incrementalCandidates(batch, Dedup.bandedSignatures(docs))
    }
    t("inc dedup sf0.1")(inc(d).count())
    t("inc dedup 10x")(inc(big).count())
    t("heavy hitters sf0.1")(graft.operators.TextOps.heavyHitters(Tables.documents(spark, d)).count())
    t("heavy hitters 10x")(graft.operators.TextOps.heavyHitters(Tables.documents(spark, big)).count())
    // r7 additions
    val boil = (dir: String) =>
      graft.operators.TextOps.stripBoilerplate(Tables.documents(spark, dir))
    t("boilerplate sf0.1")(boil(d).count())
    t("boilerplate 10x")(boil(big).count())
    t("funnel sf0.1")(WarehouseQueries.funnel(spark, d).count())
    t("funnel 10x")(WarehouseQueries.funnel(spark, big).count())
    // TxLog: the merge must cost ~touched/total of the create, because
    // untouched partitions carry by reference (no data movement)
    val txdir = "/tmp/graft_txlog_scale"
    val txfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(txdir), spark.sparkContext.hadoopConfiguration)
    txfs.delete(new org.apache.hadoop.fs.Path(txdir), true)
    val liBig = Tables.lineitem(spark, big)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("part", pmod(col("l_orderkey"), lit(16L)))
    t("txlog create 10x") {
      graft.storage.TxLog.create(liBig, txdir, Some("part"))
      graft.storage.TxLog.read(spark, txdir).count()
    }
    t("txlog merge 10x 1/16") {
      val upd = liBig.filter(col("part") === 3L && col("l_linenumber") === 1)
        .dropDuplicates("l_orderkey", "l_linenumber")
        .withColumn("l_quantity", col("l_quantity") * 2)
      graft.storage.TxLog.mergeInto(txdir, upd, Seq("l_orderkey", "l_linenumber"),
        preValidated = true)
    }
    // r8: manifest scale — commit cost must be O(files CHANGED), not
    // O(files in table). Two tables, 128 vs 8192 files; the same
    // 1-file append must cost the same on both (delta commits), and a
    // cold head resolution on the big table rides the parquet
    // checkpoint + short delta chain, never one 8192-entry JSON tree.
    def mkManyFiles(dir: String, nFiles: Int): Unit = {
      val f = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(dir), true)
      graft.storage.TxLog.create(
        spark.range(0, 1L << 20).toDF("id").repartition(nFiles), dir)
    }
    val (small, bigTx) = ("/tmp/graft_mani_small", "/tmp/graft_mani_big")
    t("manifest create 128f") { mkManyFiles(small, 128); 128L }
    t("manifest create 8192f") { mkManyFiles(bigTx, 8192); 8192L }
    def appendN(dir: String, n: Int): Long = {
      (0 until n).foreach(i =>
        graft.storage.TxLog.append(spark.range(i, i + 1).toDF("id"), dir))
      n.toLong
    }
    t("10 appends @128f")(appendN(small, 10))
    t("10 appends @8192f")(appendN(bigTx, 10))
    def jsonKb(dir: String, v: Long): Long =
      new java.io.File(s"$dir/_manifests/v$v.json").length() / 1024
    println(s"[scale] commit bytes @8192f: v1 full=${jsonKb(bigTx, 1)} KB, " +
      s"v11 delta=${new java.io.File(s"$bigTx/_manifests/v11.json").length()} B")
    graft.storage.TxLog.flushSnapshotCacheForTesting()
    t("cold head resolve 8192f (ckpt)") {
      graft.storage.TxLog.manifest(spark,
        bigTx, graft.storage.TxLog.currentVersion(spark, bigTx).get).files.size.toLong
    }
    // r7 second wave: LM scoring (count-table joins), temperature /
    // token-budget sampling (domain-bounded quota arithmetic), DQ gate
    // (one-scan audit + codegen'd quarantine)
    val lm = (dir: String) =>
      graft.operators.TextOps.lmScore(Tables.documents(spark, dir))
    t("lm score sf0.1")(lm(d).count())
    t("lm score 10x")(lm(big).count())
    val temp = (dir: String, n: Long) => graft.operators.Sampling.temperature(
      Tables.events(spark, dir).select("event_id", "event_type"),
      col("event_type"), alpha = 0.5, targetN = n, idCol = "event_id")
    t("temperature sf0.1")(temp(d, 10000L).count())
    t("temperature 10x")(temp(big, 100000L).count())
    val tokb = (dir: String, b: Long) => graft.operators.Sampling.tokenBudget(
      Tables.documents(spark, dir).select("doc_id", "source", "text"),
      col("source"), size(split(col("text"), " ")), budget = b)
    t("token budget sf0.1")(tokb(d, 8000L).count())
    t("token budget 10x")(tokb(big, 80000L).count())
    val dqr = Seq(
      "qty_le_40" -> (col("l_quantity") <= 40),
      "tax_le_5pct" -> (col("l_tax") <= 0.05))
    t("dq audit sf0.1")(graft.operators.Check.audit(Tables.lineitem(spark, d), dqr).count())
    t("dq audit 10x")(graft.operators.Check.audit(Tables.lineitem(spark, big), dqr).count())
    t("dq quarantine sf0.1")(graft.operators.Check.quarantine(Tables.lineitem(spark, d), dqr).count())
    t("dq quarantine 10x")(graft.operators.Check.quarantine(Tables.lineitem(spark, big), dqr).count())
    // r7 third wave: BM25 (posting explode + query-term-sized joins),
    // entropy (char explode + two partial-agg phases), corr moments
    // (one group-sized aggregate), resample (spine explode + LOCF),
    // PageRank (edge-linear rounds on a 10x cycle)
    val bm = (dir: String) => graft.operators.TextOps.bm25(
      Tables.documents(spark, dir), Seq("dup", "vector", "join"), k = 50)
    t("bm25 sf0.1")(bm(d).count())
    t("bm25 10x")(bm(big).count())
    val ent = (dir: String) =>
      graft.operators.TextOps.entropy(Tables.documents(spark, dir))
    t("entropy sf0.1")(ent(d).count())
    t("entropy 10x")(ent(big).count())
    val cs = (dir: String) => graft.operators.Stats.corrStats(
      Tables.lineitem(spark, dir), "l_returnflag", "l_quantity", "l_extendedprice")
    t("corr stats sf0.1")(cs(d).count())
    t("corr stats 10x")(cs(big).count())
    t("resample sf0.1")(WarehouseQueries.resample(spark, d).count())
    t("resample 10x")(WarehouseQueries.resample(spark, big).count())
    val pr = (n: Long) => graft.operators.Graph.pagerank(
      spark.range(n).select(col("id").as("src"),
        ((col("id") + 1) % n).as("dst")), iterations = 5).count()
    t("pagerank 100k-cycle")(pr(100000L))
    t("pagerank 1M-cycle")(pr(1000000L))
    // r7 wave-9/10 operators against the same 10x fact sides
    t("regression sf0.1")(WarehouseQueries.regression(spark, d).count())
    t("regression 10x")(WarehouseQueries.regression(spark, big).count())
    t("mad sf0.1")(WarehouseQueries.madOutliers(spark, d).count())
    t("mad 10x")(WarehouseQueries.madOutliers(spark, big).count())
    t("chi2 10x")(WarehouseQueries.chiSquare(spark, big).count())
    t("assoc rules sf0.1")(WarehouseQueries.assocRules(spark, d).count())
    t("assoc rules 10x")(WarehouseQueries.assocRules(spark, big).count())
    // skyline over the 10x FACT side (6M points): the staircase prune
    // must keep the exact-verify survivor set tiny
    val sky = (dir: String) => graft.operators.Skyline.skyline2(
      Tables.lineitem(spark, dir)
        .select(col("l_extendedprice"), col("l_quantity")),
      "l_extendedprice", "l_quantity").count()
    t("skyline sf0.1")(sky(d))
    t("skyline 10x")(sky(big))
    t("dedup lines sf0.1")(graft.queries.PipelineQueries
      .entries("dedup_lines")(spark, d).count())
    t("dedup lines 10x")(graft.queries.PipelineQueries
      .entries("dedup_lines")(spark, big).count())
    // k-core: 200k-node cycle with 200k pendant leaves — one peel
    // round kills every leaf, the fixpoint check stops the loop
    t("kcore 400k-node") {
      val n = 200000L
      val cyc = spark.range(n).select(col("id").as("src"),
        ((col("id") + 1) % n).as("dst"))
      val pend = spark.range(n).select(col("id").as("src"),
        (col("id") + n).as("dst"))
      graft.operators.Graph.kcore(cyc.unionAll(pend), 2).count()
    }
    // hierarchy: a 100k-DEEP chain — 17 pointer-doubling rounds
    t("hierarchy 100k-deep") {
      val n = 100000L
      val nodes = spark.range(n).select(col("id").as("node"),
        when(col("id") === 0, lit(null).cast("long"))
          .otherwise(col("id") - 1).as("parent"))
      graft.operators.Graph.flattenHierarchy(nodes).count()
    }
    // bloom index over the 10x txlog table: build once, the needle
    // read must stay file-pruned
    t("bloom build 10x") {
      val p = "/tmp/graft_scale_bloom"
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(p),
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
      graft.storage.TxLog.create(
        Tables.lineitem(spark, big).select("l_orderkey", "l_partkey",
          "l_extendedprice").repartition(32), p,
        statsCols = Seq("l_orderkey"))
      graft.storage.TxLog.buildBloomIndex(spark, p, "l_orderkey").toLong
    }
    t("bloom point lookup 10x") {
      val p = "/tmp/graft_scale_bloom"
      val planned = graft.storage.TxLog.prunedFilesByKey(
        spark, p, "l_orderkey", 7L)
      println(s"[scale]   bloom planned files: ${planned.size} of 32")
      graft.storage.TxLog.readByKey(spark, p, "l_orderkey", 7L).count()
    }
    // ANN recall at 10x: planted exact twins must dominate the top-10
    val qids = (0L until 20L).toSeq
    val bigEmb = Tables.embeddings(spark, big)
    val truth = graft.operators.Similarity.cosineTopKBatch(bigEmb, qids, 10).cache()
    truth.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      graft.operators.Similarity.recallAtK(truth, approx)
        .agg(avg("recall")).head().getDouble(0)
    val t0 = System.nanoTime()
    val rLsh = recall(graft.operators.Similarity.annLshBatch(bigEmb, qids, 10, tables = 8))
    println(f"[scale] lsh recall@10 10x   ${(System.nanoTime()-t0)/1e9}%8.2f s  recall=$rLsh%.3f")
    val tmp = java.nio.file.Files.createTempDirectory("scale_ivf").toString
    val idx = graft.operators.Ivf.fit(bigEmb, tmp, nlist = 16)
    val t1 = System.nanoTime()
    val rIvf = recall(graft.operators.Ivf.queryBatch(spark, idx, bigEmb, qids, 10, nprobe = 4))
    println(f"[scale] ivf recall@10 10x   ${(System.nanoTime()-t1)/1e9}%8.2f s  recall=$rIvf%.3f")
    val t2 = System.nanoTime()
    val pqModel = graft.operators.Pq.fit(bigEmb)
    val rPq = recall(graft.operators.Pq.queryBatch(bigEmb, pqModel, qids, 10, shortlist = 100))
    println(f"[scale] pq recall@10 10x    ${(System.nanoTime()-t2)/1e9}%8.2f s  recall=$rPq%.3f")
    spark.stop()
  }
}
