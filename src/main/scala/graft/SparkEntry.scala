package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, ReferenceQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Three query groups:
  *  - ReferenceQueries: the gwasDB surface (region/marker/locus queries,
  *    combined view, QC audits, pivots, MAF math) — SURVEY §2a
  *  - WarehouseQueries: warehouse analytics (wide aggs, join+topk,
  *    rollup, time windows, sessionize, as-of, salted agg) — SURVEY §2b
  *  - PipelineQueries: training-data ops (dedup, similarity, text,
  *    multimodal) — SURVEY §2c
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.combinedView(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.entries ++ WarehouseQueries.entries ++ PipelineQueries.entries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Keys absent here (minhash/simhash/LSH/rollhash
    * internals) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ WarehouseQueries.oracles ++ PipelineQueries.oracles
}
