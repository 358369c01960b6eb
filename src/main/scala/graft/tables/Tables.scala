package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star schema.
  *
  * All loaders are plain parquet scans: Catalyst handles column pruning
  * and predicate pushdown, so downstream operators must simply stay
  * declarative for the scan to narrow itself.
  */
object Tables {
  /** Plain parquet scan, with one normalization: the generator writes
    * naive `timestamp[us]` columns, which Spark reads as TIMESTAMP_NTZ
    * — a type `window()`/`unix_micros`/numeric casts all reject. The
    * session time zone is pinned to UTC, so the NTZ→LTZ cast is
    * value-preserving (the same micros DuckDB reads), and every
    * downstream operator keeps working against plain TimestampType.
    * The cast is a scan-side projection; pushdown/pruning are
    * unaffected. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(raw)((df, f) =>
        df.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) — illegal for Spark's
    * TimestampType. Sessions set spark.sql.legacy.parquet.nanosAsLong,
    * so `ts` arrives as nano-epoch long and is truncated to micros here
    * (matching DuckDB's ns→µs comparison granularity at the second/
    * minute thresholds every query uses). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
