package graft

import org.apache.spark.sql.functions._

import graft.queries.WarehouseQueries
import graft.tables.Tables

class WarehouseQueriesSpec extends SparkSpec {

  test("every warehouse query runs and is non-empty on sf0.001") {
    WarehouseQueries.entries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q1_agg groups cover all flag/status combinations") {
    assert(WarehouseQueries.q1Agg(spark, sf).count() == 6)
  }

  test("q_sessionize covers every event exactly once") {
    val sessions = WarehouseQueries.sessionize(spark, sf)
    val total = sessions.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    val bad = sessions.filter(col("sess_start") > col("sess_end")).count()
    assert(bad == 0)
  }

  test("q_asof_join never matches a signup after the error") {
    val bad = WarehouseQueries.asofJoin(spark, sf)
      .filter(col("signup_ts_s") > col("ts_s")).count()
    assert(bad == 0)
  }

  test("q_asof_join keeps every error event (left semantics)") {
    val errors = Tables.events(spark, sf).filter(col("event_type") === "error").count()
    assert(WarehouseQueries.asofJoin(spark, sf).count() == errors)
  }

  test("q_skew_agg equals the unsalted aggregate") {
    val salted = WarehouseQueries.skewAgg(spark, sf)
      .select("event_type", "n_events").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("upsert: updates win on collision, row count preserved, partitions prune") {
    import spark.implicits._
    val existing = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)).toDF("k", "v", "p")
    val updates = Seq((2L, "B", 1)).toDF("k", "v", "p")
    val merged = graft.operators.Upsert.mergeByKey(existing, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    val (parts, scoped) = graft.operators.Upsert.mergePartitioned(existing, updates, Seq("k"), "p")
    assert(parts == Seq(1))
    assert(scoped.select("k").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("mergeInto rewrites only touched partitions; moved keys leave no stale row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString + "/tbl"
    Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d", 3))
      .toDF("k", "v", "p").write.partitionBy("p").parquet(dir)
    def partitionBytes(p: Int): Map[String, Int] = {
      val d = new java.io.File(s"$dir/p=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        f.getName -> java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath))
      }.toMap
    }
    val untouchedBefore = partitionBytes(3)
    // k=2 updated in place in p=1; k=3 MOVES p=2 -> p=1
    val updates = Seq((2L, "B", 1), (3L, "C", 1)).toDF("k", "v", "p")
    val parts = graft.operators.Upsert.mergeInto(dir, updates, Seq("k"), "p")
    // rewrite set includes the moved key's OLD partition (p=2)
    assert(parts.map(_.toString).toSet == Set("1", "2"), s"rewrite set was $parts")
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number]("p").intValue())).toSet
    assert(rows == Set((1L, "a", 1), (2L, "B", 1), (3L, "C", 1), (4L, "d", 3)),
      s"merged table was $rows")
    // dynamic overwrite left the untouched partition's files byte-identical
    assert(partitionBytes(3) == untouchedBefore, "untouched partition was rewritten")
    // the partition the moved key vacated is gone entirely, not stale
    assert(!new java.io.File(s"$dir/p=2").exists(), "emptied partition dir survived")
  }

  test("q3_join_agg broadcasts the filtered customer dim") {
    val plan = WarehouseQueries.q3JoinAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q_top-k queries plan as TakeOrderedAndProject (no global sort)") {
    val plan = WarehouseQueries.q3JoinAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"limit not fused with sort:\n$plan")
  }
}
