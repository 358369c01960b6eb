package graft

import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Source/sink parity: the reference round-trips its data through CSV
  * exports and a Postgres server (postgres_process.Rmd); graft covers
  * parquet (native), CSV/TSV (GwasIngest + here), ORC, JSON, a JDBC
  * database (embedded Derby standing in for Postgres), and quarantined
  * JSONL ingest/export (graft.sources.Jsonl — the corpus wire format).
  */
class SourcesSpec extends SparkSpec {

  private lazy val sample = Tables.supplier(spark, sf)
    .select("s_suppkey", "s_name", "s_acctbal")
    .orderBy("s_suppkey")

  private def roundtrip(fmt: String): Unit = {
    val path = s"/tmp/graft_io_$fmt"
    sample.write.format(fmt).mode("overwrite").save(path)
    val back = spark.read.format(fmt).schema(sample.schema).load(path)
      .orderBy("s_suppkey")
    assert(back.collect().toSeq == sample.collect().toSeq, s"$fmt round-trip diverged")
  }

  test("ORC round-trip preserves rows")(roundtrip("orc"))
  test("JSON round-trip preserves rows")(roundtrip("json"))

  test("CSV round-trip with header preserves rows") {
    val path = "/tmp/graft_io_csv"
    sample.write.option("header", "true").mode("overwrite").csv(path)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(path)
      .orderBy("s_suppkey")
    assert(back.collect().toSeq == sample.collect().toSeq)
  }

  test("JSONL ingest: every line lands in exactly one of good/quarantine, with the right reason") {
    import spark.implicits._
    import graft.sources.Jsonl
    val path = "/tmp/graft_io_jsonl_quarantine"
    val lines = Seq(
      """{"doc_id":1,"source":"web","text":"hello"}""",       // good
      """{"doc_id":2,"source":"web"}""",                      // good: text null (not required)
      """{"doc_id":"x","source":"web","text":"bad type"}""",  // quarantine: type violation = corrupt line
      """{"source":"web","text":"no id"}""",                  // quarantine: missing id
      "{ not json at all",                                    // quarantine: syntax
      "null")                                                 // quarantine: JSON null literal
    lines.toDF("value").repartition(1).write.mode("overwrite").text(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, source STRING, text STRING")
    val (good, bad) = Jsonl.readJsonl(spark, path, schema, required = Seq("doc_id"))
    val goodRows = good.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(goodRows == Set((1L, "web", Some("hello")), (2L, "web", None)))
    val reasons = bad.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons.size + goodRows.size == lines.size, "a line went missing")
    assert(reasons("{ not json at all") == "unparseable")
    assert(reasons("null") == "unparseable")
    assert(reasons("""{"doc_id":"x","source":"web","text":"bad type"}""")
      == "unparseable")
    assert(reasons("""{"source":"web","text":"no id"}""") == "null_required:doc_id")
  }

  test("JSONL write/read round-trip preserves rows (clean input, empty quarantine)") {
    import graft.sources.Jsonl
    val path = "/tmp/graft_io_jsonl_rt"
    Jsonl.writeJsonl(sample, path)
    val (back, bad) = Jsonl.readJsonl(spark, path,
      sample.schema, required = Seq("s_suppkey"))
    assert(bad.isEmpty, "clean export produced quarantine rows")
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      sample.collect().toSeq, "JSONL round-trip diverged")
  }

  test("JDBC round-trip via embedded Derby (the reference's RDBMS role)") {
    val url = "jdbc:derby:/tmp/graft_derby;create=true"
    sample.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", "supplier_export")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode("overwrite")
      .save()
    val back = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", "supplier_export")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
      .orderBy("s_suppkey")
    assert(back.count() == sample.count())
    assert(back.select(sum("s_acctbal")).head().getDouble(0) ==
      sample.select(sum("s_acctbal")).head().getDouble(0))
  }
}
