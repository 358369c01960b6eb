package graft

import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Source/sink parity: the reference round-trips its data through CSV
  * exports and a Postgres server (postgres_process.Rmd); graft covers
  * parquet (native), CSV/TSV (GwasIngest + here), ORC, JSON, and a
  * JDBC database (embedded Derby standing in for Postgres).
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
