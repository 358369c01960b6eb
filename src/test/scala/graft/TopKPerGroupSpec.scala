package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopK, TopKPerGroupExec}
import graft.tables.Tables

class TopKPerGroupSpec extends SparkSpec {

  private def custom() = TopK.topKPerGroup(
    Tables.lineitem(spark, sf).select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
    Seq(col("l_suppkey")),
    Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
    k = 3)

  test("custom TopKPerGroup matches the row_number window formulation") {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val viaWindow = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    assert(custom().collect().map(key).sorted.toSeq ==
      viaWindow.collect().map(key).sorted.toSeq)
  }

  test("plan has partial and final TopKPerGroupExec around one exchange") {
    val df = custom()
    df.collect() // materialize AQE final plan
    // AQE wraps stages, so assert on the rendered final plan
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, s"missing TopK phases:\n$plan")
    assert(plan.contains("], true"), s"no partial phase:\n$plan")
    assert(plan.contains("], false"), s"no final phase:\n$plan")
    assert(plan.contains("Exchange"), s"no exchange between phases:\n$plan")
  }

  test("optimizer rule rewrites the row_number idiom into TopKPerGroup") {
    GraftExtensions.register(spark)
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def windowForm(keepRn: Boolean) = {
      val base = Tables.lineitem(spark, sf)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      if (keepRn) base else base.drop("rn")
    }
    // rn dropped → rank values are dead → rewritten
    val rewritten = windowForm(keepRn = false)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"),
      s"rule did not fire:\n${rewritten.queryExecution.optimizedPlan}")
    // rn kept → rank is observable → NOT rewritten
    val kept = windowForm(keepRn = true)
    assert(!kept.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"),
      "rule fired although the rank column is referenced")
    // same multiset either way
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    assert(rewritten.collect().map(key).sorted.toSeq ==
      kept.drop("rn").collect().map(key).sorted.toSeq)
  }

  test("rule leaves global (no PARTITION BY) row_number top-k untouched") {
    GraftExtensions.register(spark)
    val w = Window.orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val df = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .drop("rn")
    assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"),
      "rule must not fire without grouping (ClusteredDistribution(Nil) crashes)")
    assert(df.count() == 5) // and the query still runs
  }

  test("returns at most k rows per group, exactly the best ones") {
    val rows = custom().collect()
    val byGroup = rows.groupBy(_.getLong(0))
    assert(byGroup.values.forall(_.length <= 3))
    val bestGlobal = Tables.lineitem(spark, sf)
      .groupBy("l_suppkey").agg(max("l_extendedprice").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byGroup.foreach { case (g, rs) =>
      assert(rs.map(_.getDouble(3)).max == bestGlobal(g),
        s"group $g missing its max")
    }
  }
}
