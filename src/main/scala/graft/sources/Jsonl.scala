package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingest and export — the wire format
  * web-scale text corpora actually arrive in (Common Crawl derivatives,
  * API dumps), where a 100 TB drop ALWAYS contains some malformed
  * lines and "crash on line 40 billion" is not an option. The contract
  * here is total: every input line lands in exactly one of two outputs
  * — `good` (schema-projected, required columns present) or
  * `quarantine` (the raw line plus why) — so ingest is lossless,
  * auditable, and re-driveable.
  *
  * Implementation shape: ONE text scan + a codegen'd `from_json` per
  * line, split by parse success. This deliberately avoids the built-in
  * JSON reader's `_corrupt_record` column, which cannot be filtered
  * without caching the whole relation (a documented Spark limitation —
  * and a non-starter at corpus scale); the text+from_json form needs
  * no cache, keeps whole-stage codegen, and the two outputs share the
  * single scan when both are consumed in one action (or prune to one
  * branch when not). Lines are splittable-format friendly: Spark
  * parallelizes the text read by file blocks, so ingest scales with
  * input bytes, not file count.
  */
object Jsonl {

  /** Read JSONL at `path` against a declared schema.
    * Returns (good, quarantine):
    *  - good: one row per parseable line, schema-projected; fields
    *    absent from a line surface as nulls (the JSON contract),
    *    EXCEPT `required` columns — a line whose required field is
    *    missing, null, or type-mismatched (lenient parsing nulls the
    *    field) is quarantined instead of admitted half-empty.
    *  - quarantine: (raw, reason) — `unparseable` for JSON syntax
    *    failures, `null_required:<col>` for the first violated
    *    required column in declaration order.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                required: Seq[String] = Nil): (DataFrame, DataFrame) =
    split(spark.read.text(path), schema, required)

  /** The parse/split itself, over any DataFrame with a string `value`
    * column — shared by the batch reader and the streaming ingest. */
  def split(lines: DataFrame, schema: StructType,
            required: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val (goodRaw, quarantine) = splitKeepRaw(lines, schema, required)
    (goodRaw.drop("_raw"), quarantine)
  }

  /** [[split]] with the good side keeping its original line as
    * `_raw` — what the constraint-quarantine route needs: a row that
    * parses fine but violates a table CHECK must quarantine as its
    * ORIGINAL line, not a re-serialization. */
  private[graft] def splitKeepRaw(lines: DataFrame, schema: StructType,
                                  required: Seq[String]): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_raw"),
      "Jsonl.readJsonl: '_raw' is reserved")
    required.foreach(c => require(schema.fieldNames.contains(c),
      s"Jsonl.readJsonl: required column '$c' is not in the schema"))
    // PERMISSIVE from_json does NOT return a null struct for malformed
    // input — it returns all-null fields, indistinguishable from a
    // legitimately empty object. The corrupt-record column inside the
    // PARSE schema is the reliable detector: it carries the raw text
    // exactly when parsing failed.
    require(!schema.fieldNames.contains("_corrupt"),
      "Jsonl.readJsonl: '_corrupt' is reserved")
    val parseSchema = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = lines
      .select(col("value").as("raw"),
        from_json(col("value"), parseSchema,
          java.util.Map.of("columnNameOfCorruptRecord", "_corrupt")).as("_rec"))
    val nullReq = required.foldLeft(lit(null).cast("string")) { (acc, c) =>
      coalesce(acc, when(col(s"_rec.$c").isNull, lit(s"null_required:$c")))
    }
    // a bare JSON `null` line parses "successfully" to a null/empty
    // record, which an empty `required` list would silently admit as
    // an all-null row — name it unparseable explicitly
    val reason = when(col("_rec").isNull || col("_rec._corrupt").isNotNull ||
      trim(col("raw")) === "null", "unparseable").otherwise(nullReq)
    val good = parsed.filter(reason.isNull)
      .select(col("raw").as("_raw") +:
        schema.fieldNames.map(c => col(s"_rec.$c")): _*)
    val quarantine = parsed.filter(reason.isNotNull)
      .select(col("raw"), reason.as("reason"))
    (good, quarantine)
  }

  /** Export `df` as JSONL: one JSON object per row, Spark-sharded (one
    * file per partition — size the partitioning upstream, e.g. via
    * Layout.compactBySize semantics, for the target shard size). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** STREAMING quarantined ingest into a transactional table: watch
    * `srcPath` for arriving JSONL files and land each micro-batch with
    * ONE [[split]] pass — good rows commit to the TxLog table at
    * `tablePath` via `appendBatch`, quarantine rows commit to a second
    * TxLog table at `quarantinePath` (created here on first start,
    * schema `raw STRING, reason STRING, batch_id BIGINT`) via the SAME
    * batch-id watermark. Both sides are EXACTLY-ONCE: a crash between
    * the two commits replays the batch, and whichever side already
    * recorded that batch id skips while the other catches up — the
    * watermark is per-table, so the two tables converge independently
    * without ever double-applying.
    *
    * foreachBatch rather than two streaming sinks because two sinks
    * would each re-read and re-parse the source; here every line is
    * read once, split once, routed once. Create the good-side TxLog
    * table first (its declared schema is the ingest contract); pass a
    * durable `checkpointLocation` in production — the replay detection
    * rides on batch-id monotonicity, exactly [[graft.storage.TxLog
    * .streamAppend]]'s caveat. */
  /** `quarantineViolations = true` composes the table's CHECK
    * constraints into the routing: a line that PARSES fine but
    * violates a CHECK quarantines as its original raw line with
    * reason `check:<name>` instead of failing the whole micro-batch —
    * the production posture for dirty feeds into a governed table.
    * Constraints re-resolve from the table head each batch, so an
    * `ALTER ... ADD CONSTRAINT` mid-stream starts quarantining on the
    * next trigger. UNIQUE constraints stay batch-refusing (a key
    * collision is relational, not row-local). One caveat, stated
    * honestly: if a constraint changes between a crash and that
    * batch's replay, the quarantine side recomputes under the NEW set
    * while the already-committed good side keeps the old split — the
    * good table stays exact, the audit trail for that one batch can
    * over- or under-count. */
  def streamIngestTx(spark: SparkSession, srcPath: String, schema: StructType,
                     required: Seq[String], tablePath: String,
                     quarantinePath: String,
                     checkpointLocation: Option[String] = None,
                     maxFilesPerTrigger: Int = 1,
                     quarantineViolations: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.storage.TxLog
    val quarSchema = StructType.fromDDL(
      "raw STRING, reason STRING, batch_id BIGINT")
    if (TxLog.currentVersion(spark, quarantinePath).isEmpty) {
      // a NON-EMPTY non-table directory here is a legacy plain-parquet
      // quarantine (pre-exactly-once deployments): silently creating a
      // TxLog table over it would strand every already-quarantined row
      // outside the documented read path — fail loudly instead of
      // losing the audit trail
      val qp = new org.apache.hadoop.fs.Path(quarantinePath)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        qp.toUri, spark.sparkContext.hadoopConfiguration)
      require(!fs.exists(qp) || fs.listStatus(qp).isEmpty,
        s"Jsonl.streamIngestTx: $quarantinePath holds existing non-table " +
          "data (a legacy plain-parquet quarantine?) — migrate it into a " +
          "TxLog table (TxLog.create from spark.read.parquet over it) or " +
          "point quarantinePath somewhere fresh")
      TxLog.create(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], quarSchema),
        quarantinePath)
    }
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(srcPath)
    val w = lines.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (goodRaw, parseQuarantine) = splitKeepRaw(batch, schema, required)
        val checks =
          if (quarantineViolations) TxLog.constraintsOf(spark, tablePath)
          else Nil
        val reason = TxLog.constraintViolationReason(checks)
        val good = goodRaw.filter(reason.isNull)
          .select(schema.fieldNames.map(col): _*)
        val quarantine = parseQuarantine.unionByName(
          goodRaw.filter(reason.isNotNull)
            .select(col("_raw").as("raw"), reason.as("reason")))
        TxLog.appendBatch(good, tablePath, batchId)
        TxLog.appendBatch(quarantine.withColumn("batch_id", lit(batchId)),
          quarantinePath, batchId)
        ()
      }
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
}
