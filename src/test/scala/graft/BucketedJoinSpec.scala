package graft

import org.apache.spark.sql.functions._

import graft.storage.Bucketed
import graft.tables.Tables

/** Co-located joins via bucketing — the SURVEY §5 claim that fact-fact
  * joins at 100 TB pre-shuffle ONCE at write time and then join with no
  * exchange at read time, demonstrated on a real bucketed layout.
  */
class BucketedJoinSpec extends SparkSpec {

  private def freshBucketed(name: String, df: org.apache.spark.sql.DataFrame,
                            key: String): org.apache.spark.sql.DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    Bucketed.ensure(spark, name, df, key, 8, s"/tmp/graft_spec_bucket_$name")
  }

  test("bucketed tables join without a shuffle exchange; bucket-column filter prunes buckets") {
    val li = freshBucketed("li_bucketed",
      Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"),
      "l_orderkey")
    val ord = freshBucketed("ord_bucketed",
      Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus"),
      "o_orderkey")

    val joined = li.join(ord.hint("merge"),
      col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffled:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, sf).count())

    // an equality predicate on the bucket column plans a scan of ONE
    // bucket out of 8 — the same file-level pruning a 100 TB point
    // lookup rides. The planner skips bucketed scans when nothing
    // downstream exploits the distribution (autoBucketedScan), so pin
    // it on for the pruning assert.
    val key = ord.select(min("o_orderkey")).head().getLong(0)
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val pruned = ord.filter(col("o_orderkey") === lit(key))
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing from scan:\n$scan")
      assert(pruned.count() >= 1L)
    } finally spark.conf.set(conf, saved)
  }

  test("q_bucket_join: bucketed result equals the plain unbucketed join+agg") {
    val out = graft.queries.WarehouseQueries.bucketJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.queries.Det.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == plain.toSeq, out.mkString(", "))
  }
}
