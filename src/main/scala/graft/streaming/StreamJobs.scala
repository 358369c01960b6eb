package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.tables.Tables

/** Structured Streaming jobs over the events stream.
  *
  * The batch-parity shapes live in WarehouseQueries (q_time_window /
  * stream_window_counts); here the same plans run incrementally:
  * watermark bounds state, tumbling windows aggregate per event-type.
  * At scale this is the `readStream → withWatermark → window agg →
  * writeStream` shape; locally the parquet file drives one batch via
  * `processAllAvailable`.
  */
object StreamJobs {

  /** Streaming source over a directory of event parquet files (file
    * sources stream new files as they land), with the nanos→micros
    * normalization the batch loader applies. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Hourly tumbling-window counts per event type, 2h watermark. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("wstart"), col("event_type"), col("n"))

  /** Run a streaming aggregate to a named in-memory sink and block until
    * the source is drained (local smoke path). */
  def runToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
