package graft

import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Co-located joins via bucketing — the SURVEY §5 claim that fact-fact
  * joins at 100 TB pre-shuffle ONCE at write time and then join with no
  * exchange at read time, demonstrated on a real bucketed layout.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // a previous JVM's warehouse dir survives its in-memory metastore —
    // DROP above is then a no-op, so clear the locations too
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(
        spark.table("ord_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffled:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }
}
