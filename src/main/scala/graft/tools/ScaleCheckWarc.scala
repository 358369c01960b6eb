package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Warc

/** WARC ingest throughput ladder: N gzip shards of synthetic response
  * records (Common Crawl shape — one task per shard), parsed +
  * HTML-extracted, at 1× and 4× the shard count. The claims under
  * measurement: per-shard cost is FLAT in shard count (file-grain
  * parallelism — 4× shards on ≥4× idle cores ≈ same wall-clock), and
  * the decompress→frame→extract chain's MB/s is the per-core unit
  * economics a 90k-shard crawl multiplies.
  *
  * Records carry realistic markup (~2 KB bodies) so the extractor's
  * regexp chain is measured too, not just gzip.
  */
object ScaleCheckWarc {
  private def t(name: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[scalewarc] $name%-40s $s%8.2f s  rows=$n")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scalewarc")
    import spark.implicits._
    val root = "/tmp/graft_scalewarc"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val docsPerShard = 2000
    val body = ("<p>" + ("the quick brown fox jumps over the lazy dog " * 8)
      + "</p>") * 5 // ~2 KB of markup per record
    def shards(dir: String, n: Int): Unit = {
      val df = spark.range(n.toLong * docsPerShard)
        .select(col("id").as("doc_id"),
          concat(lit("<html><head><style>p{}</style></head><body>" +
            "<!-- nav --><div>"), lit(body), lit("</div><script>x()" +
            "</script></body></html>")).as("text"))
        .repartition(n)
      Warc.write(df, s"$root/$dir", compress = true)
    }

    Seq(("8 shards", 8), ("32 shards", 32)).foreach { case (tag, n) =>
      shards(tag.replace(' ', '_'), n)
      val dir = s"$root/${tag.replace(' ', '_')}"
      val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getLen).sum
      var secs = 0.0
      secs = t(s"parse+extract $tag (cold)")(
        graft.operators.TextOps.htmlExtract(
          Warc.read(spark, s"$dir/*.warc.gz")
            .select(col("target_uri"), col("payload").as("html")))
          .filter(length(col("text")) > 0).count())
      val secs2 = t(s"parse+extract $tag (warm)")(
        graft.operators.TextOps.htmlExtract(
          Warc.read(spark, s"$dir/*.warc.gz")
            .select(col("target_uri"), col("payload").as("html")))
          .filter(length(col("text")) > 0).count())
      val mb = bytes / 1e6
      println(f"[scalewarc] $tag%-14s ${mb}%8.1f MB gz  " +
        f"${mb / math.min(secs, secs2)}%8.1f MB/s (min-of-2, compressed)")
    }
    spark.stop()
  }
}
