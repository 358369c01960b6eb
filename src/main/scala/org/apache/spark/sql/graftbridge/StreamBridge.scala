package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** Streaming-side companion to [[ExprBridge]].
  *
  * A v1 streaming `Source.getBatch` must return a DataFrame whose
  * logical plan reports `isStreaming = true` — `MicroBatchExecution`
  * asserts it before splicing the batch plan into the query. The flag
  * lives on leaf nodes whose constructors are `private[sql]`, so the
  * conversion lives here in the bridge namespace.
  *
  * The conversion must yield a SINGLE streaming leaf, not a plan with
  * its internal leaves re-marked: a re-marked plan hands the engine
  * joins/aggregates between "streaming" relations, which
  * IncrementalExecution then plans as STATEFUL stream-stream
  * operators — a batch full-outer diff would silently hold its
  * unmatched rows in join state forever instead of emitting them. So
  * the batch computation is compiled by the BATCH planner (pushdown,
  * codegen, the plan it would have anyway) down to an RDD, and the
  * streaming side sees one opaque `LogicalRDD(isStreaming = true)`
  * leaf over it — the same shape Spark's own checkpoint/memory paths
  * use. `toRdd` only BUILDS the DAG; nothing executes until the
  * micro-batch runs.
  */
object StreamBridge {

  /** Re-plan a batch DataFrame as a one-leaf streaming DataFrame. */
  def asStreamingLeaf(df: DataFrame): DataFrame = {
    val classic = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
    val spark = classic.sparkSession
    val qe = classic.queryExecution
    ExprBridge.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = true)(spark))
  }

  /** The sink-side counterpart of [[asStreamingLeaf]]: the DataFrame a
    * v1 `Sink.addBatch` receives still carries streaming relations in
    * its LOGICAL plan, so feeding it to any batch writer would re-plan
    * and hit "streaming sources must be executed with
    * writeStream.start()". The batch's PHYSICAL plan is already
    * incremental-executed, though — wrap its RDD as a plain batch
    * leaf and write that. */
  def asBatchLeaf(df: DataFrame): DataFrame = {
    val classic = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
    val qe = classic.queryExecution
    ExprBridge.ofRows(classic.sparkSession,
      LogicalRDD(qe.analyzed.output, qe.toRdd)(classic.sparkSession))
  }

  /** An empty DataFrame of `schema` whose plan is already streaming —
    * the zero-rows micro-batch. */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame =
    ExprBridge.ofRows(spark,
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
}
