package graft

import graft.queries.WarehouseQueries
import graft.streaming.StreamJobs

class StreamingSpec extends SparkSpec {

  test("streaming window counts match the batch-parity query") {
    // file stream sources want a directory; stage the events there
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = StreamJobs.eventsStream(spark, dir)
    val q = StreamJobs.runToMemory(StreamJobs.windowCounts(stream), "wc_test")
    try {
      val streamed = spark.table("wc_test")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = WarehouseQueries.streamWindowCounts(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "streaming result diverges from batch plan")
    } finally q.stop()
  }

  test("stream-stream click→purchase join matches the batch join") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.clickToPurchaseJoin(StreamJobs.eventsStream(spark, dir)),
      "ss_join", mode = "append")
    try {
      val streamed = spark.table("ss_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = StreamJobs.clickToPurchaseJoin(graft.tables.Tables.events(spark, sf))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, "stream-stream join diverges from batch join")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup emits each (user, event_type) key once") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.dedupStream(StreamJobs.eventsStream(spark, dir)),
      "dd_test", mode = "append")
    try {
      val out = spark.table("dd_test")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.length == out.distinct.length, "duplicate keys leaked")
      val batchKeys = graft.tables.Tables.events(spark, sf)
        .select("user_id", "event_type").distinct().count()
      assert(out.length == batchKeys, "missing keys vs batch distinct")
    } finally q.stop()
  }

  test("streaming near-dup candidates are batch candidates and recall the planted near-dup") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again and once"),
      (3L, "completely unrelated text about spark catalyst optimizer internals here")
    ).toDF("doc_id", "text")
    val dir = "/tmp/graft_stream_docs"
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.nearDupPairsStream(spark, stream), "nd_test", mode = "append")
    try {
      val streamed = spark.table("nd_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.Dedup.minhashCandidates(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.subsetOf(batch),
        s"streamed pair not in batch candidates: ${streamed -- batch}")
      assert(streamed.contains((0L, 1L)), "exact dup pair missed by the stream")
      // every doc in a multi-doc cluster surfaces in some pair
      assert(streamed.exists(p => p._1 == 2L || p._2 == 2L), "near dup never paired")
      assert(!streamed.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
    } finally q.stop()
  }

  test("stateful mapGroupsWithState totals match the batch aggregate") {
    val dir = "/tmp/graft_stream_events"
    graft.tables.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = StreamJobs.eventsStream(spark, dir)
    val q = StreamJobs.runToMemory(
      StreamJobs.userTotalsStream(spark, stream), "ut_test", mode = "update")
    try {
      val streamed = spark.table("ut_test")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.tables.Tables.events(spark, sf)
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch, "stateful stream diverges from batch counts")
    } finally q.stop()
  }
}
