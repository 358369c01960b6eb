package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC ingest: Content-Length framing (payloads containing the
  * literal record marker cannot break parsing), gzip multi-member
  * streams (the Common Crawl layout), oversize-payload skip-through,
  * HTTP body extraction, and soft-fail on a truncated tail.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_warc_$tag").toString

  test("round trip: response records come back byte-exact, marker-in-payload safe") {
    val dir = freshDir("rt")
    val tricky = "line1\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nline2"
    val docs = Seq((1L, "plain text"), (2L, tricky), (3L, "third"))
      .toDF("doc_id", "text")
    Warc.write(docs.repartition(2), dir)
    val got = Warc.read(spark, s"$dir/*.warc")
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("payload"), col("record_type"),
        col("http_status"))
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    assert(got.map(_.getString(1)).toSeq ==
      Seq("plain text", tricky, "third"),
      "Content-Length framing must survive a payload spelling the record marker")
    assert(got.forall(_.getString(2) == "response"))
    assert(got.forall(_.getInt(3) == 200))
  }

  test("gzip: multi-member concatenation (the Common Crawl shape) streams through") {
    val dir = freshDir("gz")
    // two separate gzip MEMBERS appended into one .warc.gz file
    val f = new java.io.File(dir, "multi.warc.gz")
    val out = new java.io.FileOutputStream(f)
    Seq("alpha", "beta").zipWithIndex.foreach { case (body, i) =>
      val member = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(member)
      val block = ("HTTP/1.1 200 OK\r\n\r\n" + body).getBytes("UTF-8")
      gz.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://x/doc/$i\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8"))
      gz.write(block); gz.write("\r\n\r\n".getBytes); gz.close()
      out.write(member.toByteArray)
    }
    out.close()
    val got = Warc.read(spark, s"$dir/*.warc.gz")
      .select("payload").as[String].collect().sorted.toSeq
    assert(got == Seq("alpha", "beta"),
      "JDK gzip must stream across member boundaries")
  }

  test("oversize payloads truncate but never break the NEXT record's framing") {
    val dir = freshDir("big")
    val f = new java.io.File(dir, "big.warc")
    val out = new java.io.FileOutputStream(f)
    def rec(t: String, body: String): Array[Byte] = {
      val block = body.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: $t\r\nContent-Length: ${block.length}\r\n\r\n")
        .getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes
    }
    out.write(rec("resource", "x" * 1000)) // over budget
    out.write(rec("resource", "small"))    // must still parse
    out.close()
    val got = Warc.read(spark, s"$dir/*.warc", maxPayloadBytes = 16)
      .orderBy("content_length")
      .select("payload", "content_length").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "small")
    assert(got(1).getString(0) == "x" * 16,
      "over-budget payload truncates at the cap")
    assert(got(1).getLong(1) == 1000L,
      "content_length reports the TRUE size, not the kept prefix")
  }

  test("a truncated tail fails SOFT: the parsed prefix survives") {
    val dir = freshDir("cut")
    val f = new java.io.File(dir, "cut.warc")
    val out = new java.io.FileOutputStream(f)
    val good = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 4\r\n\r\n" +
      "good\r\n\r\n").getBytes("UTF-8")
    val cut = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999\r\n\r\nonly-a-bit"
      .getBytes("UTF-8")
    out.write(good); out.write(cut); out.close()
    val got = Warc.read(spark, s"$dir/*.warc")
      .select("payload").as[String].collect().toSeq
    assert(got == Seq("good"),
      "one truncated file must yield its parsed prefix, not kill the job")
  }
}
