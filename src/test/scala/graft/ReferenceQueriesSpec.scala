package graft

import org.apache.spark.sql.functions._

import graft.queries.ReferenceQueries

class ReferenceQueriesSpec extends SparkSpec {

  test("driver smoke contract: SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries key with an oracle entry and vice versa is consistent") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without queries: ${os -- qs}")
  }

  test("no query key collides across the three query modules") {
    val groups = Seq(
      graft.queries.ReferenceQueries.entries.keySet,
      graft.queries.WarehouseQueries.entries.keySet,
      graft.queries.PipelineQueries.entries.keySet)
    val total = groups.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"key collision: union ${SparkEntry.queries.size} vs sum $total — " +
        groups.combinations(2).flatMap { case Seq(a, b) => a intersect b }.toSeq)
  }

  test("every reference query runs and is non-empty on sf0.001") {
    ReferenceQueries.entries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q_chr_counts partitions every lineitem row exactly once") {
    val total = ReferenceQueries.chrCounts(spark, sf)
      .agg(sum("n")).head().getLong(0)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == rows)
  }

  test("q_top_hits is sorted by price descending") {
    val prices = ReferenceQueries.topHits(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q_window_rank yields exactly one row per group") {
    val df = ReferenceQueries.windowRank(spark, sf)
    assert(df.count() == df.select("l_suppkey").distinct().count())
  }

  test("q_maf_calc stays within [0, 1]") {
    val bad = ReferenceQueries.mafCalc(spark, sf)
      .filter(col("maf") < 0 || col("maf") > 1).count()
    assert(bad == 0)
  }

  test("q_region_filter plan pushes the filters into the parquet scan") {
    val plan = ReferenceQueries.regionFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "no pushdown section in scan")
    assert(plan.contains("EqualTo(l_suppkey,5)"), s"suppkey filter not pushed:\n$plan")
  }

  test("q_combined_view joins dims via broadcast, fact side unshuffled") {
    val plan = ReferenceQueries.combinedView(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact got shuffled for a dim join:\n$plan")
  }

  test("q_antijoin_qc equals the NOT EXISTS reformulation") {
    val anti = ReferenceQueries.antijoinQc(spark, sf).count()
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet").filter(col("o_totalprice") > 300000)
    // anti + semi partition the customer table
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + semi == c.count())
  }
}
