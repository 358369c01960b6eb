package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.Warc
import graft.storage.TxLog

/** The crawl-to-corpus composition — the pipeline a pretraining team
  * actually runs, end to end on this engine's own operators:
  *
  *   WARC.gz (Common Crawl shape) → HTML extraction → language id →
  *   quality filter → exact dedup → a transactional TxLog corpus,
  *
  * batch AND streaming (arriving crawl shards land exactly-once via
  * the batch-id watermark).
  */
class CrawlE2eSpec extends SparkSpec {
  import spark.implicits._

  test("batch: WARC → extract → langid → quality → dedup → TxLog corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft_crawl_e2e")
    val warcDir = root.resolve("crawl").toString
    val corpus = root.resolve("corpus").toString
    val prose = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet field while the morning light is soft"
    // four pages: two DUPLICATES of the same article, one distinct,
    // one junk page whose markup carries almost no prose
    val pages = Seq(
      (1L, s"<html><body><p>$prose</p><script>track()</script></body></html>"),
      (2L, s"<html><head><style>b{}</style></head><body><p>$prose</p></body></html>"),
      (3L, "<html><body><p>a completely different story about the sea " +
        "and the long wind that carries the small boats home at dusk" +
        "</p></body></html>"),
      (4L, "<html><body><script>var x=1;</script>ok</body></html>"))
      .toDF("doc_id", "text") // Warc.write takes (doc_id, text)
    Warc.write(pages, warcDir, compress = true)
    val parsed = Warc.read(spark, s"$warcDir/*.warc.gz")
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("payload").as("html"))
    val extracted = TextOps.htmlExtract(parsed).select("doc_id", "text")
    // duplicates 1 and 2 extract to IDENTICAL prose even though their
    // markup differs — extraction is what makes dedup see through HTML
    val texts = extracted.orderBy("doc_id").select("text").as[String].collect()
    assert(texts(0) == texts(1) && texts(0) == prose)
    val passing = TextOps.quality(extracted)
      .filter(col("n_words") >= 10).select("doc_id")
    val kept = extracted.join(passing, "doc_id")
    assert(kept.count() == 3, "the junk page must fail the quality gate")
    val deduped = Dedup.exact(kept.select("doc_id", "text"))
    assert(deduped.count() == 2, "the duplicate article must collapse")
    TxLog.create(deduped, corpus)
    assert(TxLog.read(spark, corpus).count() == 2)
    assert(TxLog.fastCount(spark, corpus).contains(2L))
  }

  test("streaming: arriving WARC shards land exactly-once in a TxLog table") {
    val root = java.nio.file.Files.createTempDirectory("graft_crawl_stream")
    val src = root.resolve("arriving"); java.nio.file.Files.createDirectories(src)
    val tbl = root.resolve("tbl").toString
    TxLog.create(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "target_uri STRING, payload STRING")), tbl, None)
    // two shards arrive before the stream starts (file-source order)
    Warc.write(Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"),
      src.resolve("shard0").toString, compress = true)
    Warc.write(Seq((3L, "three")).toDF("doc_id", "text"),
      src.resolve("shard1").toString, compress = true)
    val q = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.warc.gz")
      .option("recursiveFileLookup", "true")
      .load(src.toString)
      .writeStream
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        TxLog.appendBatch(
          Warc.parse(batch).select("target_uri", "payload"), tbl, batchId)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = TxLog.read(spark, tbl).select("payload").as[String]
      .collect().sorted.toSeq
    assert(rows == Seq("one", "three", "two"))
    // replaying an already-committed batch id is a no-op
    val v = TxLog.currentVersion(spark, tbl).get
    TxLog.appendBatch(TxLog.read(spark, tbl).limit(1), tbl, 0L)
    assert(TxLog.currentVersion(spark, tbl).contains(v),
      "batch replay must not re-commit")
    assert(TxLog.read(spark, tbl).count() == 3)
  }
}
