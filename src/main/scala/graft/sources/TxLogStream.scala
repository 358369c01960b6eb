package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.storage.TxLog

/** TxLog tables as a first-class Structured Streaming SOURCE — the
  * Delta `spark.readStream.format("delta")` shape (reference app.R's
  * Postgres tables have no change stream at all; this is the piece a
  * warehouse needs so downstream consumers don't poll):
  *
  *   spark.readStream.format("graft-txlog")
  *     .option("path", tableDir)
  *     .option("sinceVersion", "latest")      // or a version, or absent = full snapshot first
  *     .option("maxVersionsPerBatch", "10")   // optional rate limit
  *     .load()
  *
  * Two modes:
  *   - **append mode** (default): each micro-batch is the rows of the
  *     versions newly committed in `(start, end]`, planned at FILE
  *     granularity from the manifests' set difference
  *     ([[TxLog.appendsSince]] — zero joins, zero diffing). A
  *     merge/delete/compact inside a batch range fails the stream
  *     LOUDLY (file-level increments are only row-accurate while
  *     history is append-only) — consume the change feed instead.
  *   - **change-feed mode** (`readChangeFeed=true`, `keys=k1,k2`):
  *     each micro-batch is [[TxLog.changes]] over the version range —
  *     net row-level insert/update/delete between the two endpoint
  *     snapshots, `_change_type` appended (`withPreimages=true` adds
  *     `update_preimage` rows). Feeds [[TxLog.applyChanges]] directly,
  *     closing the CDC-replica loop in ONE streaming job with no
  *     intermediate file relay.
  *
  * Offsets ARE committed versions (a `LongOffset` of the version
  * number): monotonic, total-ordered, and — because manifests are
  * immutable once committed — every batch is exactly REPLAYABLE after
  * a restart (same offset pair, same files, same rows), which is the
  * property exactly-once sinks need from a source. The checkpointed
  * version must survive [[TxLog.vacuum]] (`keepVersions` ≥ stream
  * lag), the same retention contract as Delta's.
  *
  * `sinceVersion` is the EXCLUSIVE base: rows committed at versions
  * strictly above it flow through the stream. Absent or `0`, the
  * first batch is the full table snapshot at the then-current head
  * (one multi-version batch, like Delta's initial snapshot);
  * `latest` starts from the head at stream start — new commits only.
  *
  * Schema is pinned at stream start from the head manifest; additive
  * schema evolution mid-stream fails the batch loudly with a
  * restart-the-stream message instead of silently dropping the new
  * columns.
  *
  * Scale note: offsets are VERSION-granular, so the initial full
  * snapshot of a table created in one commit arrives as one batch.
  * On a 100 TB table, bootstrap the consumer with a BATCH read of the
  * snapshot and start the stream with `sinceVersion=latest` (the
  * pattern TxLogStreamSpec's CDC-replica test pins) — then every
  * micro-batch is commit-sized, and `maxVersionsPerBatch` bounds
  * catch-up after downtime.
  */
class TxLogStream extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-txlog"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), TxLogStream.schemaFor(sqlContext.sparkSession,
      TxLogStream.Opts(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val opts = TxLogStream.Opts(parameters)
    new TxLogSource(spark, opts,
      TxLogStream.resolveBase(spark, opts, metadataPath))
  }
}

object TxLogStream {

  /** Parsed, validated source options (keys case-insensitive). */
  final case class Opts(path: String, cdf: Boolean, keys: Seq[String],
                        withPreimages: Boolean, since: Option[String],
                        maxVersionsPerBatch: Option[Long]) {
    since.foreach { s =>
      require(s == "latest" || (s.nonEmpty && s.forall(_.isDigit)),
        s"graft-txlog: sinceVersion must be 'latest' or a version number, got '$s'")
    }
    maxVersionsPerBatch.foreach(m =>
      require(m > 0, s"graft-txlog: maxVersionsPerBatch must be positive, got $m"))
    if (cdf) require(keys.nonEmpty,
      "graft-txlog: readChangeFeed=true needs keys=<k1,k2,...> (the row identity " +
        "the change diff joins on)")
  }

  object Opts {
    def apply(parameters: Map[String, String]): Opts = {
      val p = parameters.map { case (k, v) => k.toLowerCase -> v }
      Opts(
        path = p.getOrElse("path", throw new IllegalArgumentException(
          "graft-txlog: option 'path' (the TxLog table directory) is required")),
        cdf = p.get("readchangefeed").exists(_.toBoolean),
        keys = p.get("keys").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil),
        withPreimages = p.get("withpreimages").exists(_.toBoolean),
        since = p.get("sinceversion"),
        maxVersionsPerBatch = p.get("maxversionsperbatch").map(_.toLong))
    }
  }

  /** Resolve the stream's EXCLUSIVE base version — and make it stable
    * across restarts. `sinceVersion=latest` means the head at FIRST
    * start, not at every start: re-resolving "latest" on a restart
    * would skip whatever committed while the query was down (silent
    * data loss between the checkpointed offset and the new head). So
    * the resolved base persists into the query's source-metadata dir
    * on first creation and reads back on every restart — the same
    * contract file-based v1 sources keep there. */
  def resolveBase(spark: SparkSession, opts: Opts, metadataPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-txlog-base")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    } else {
      val base = opts.since match {
        case Some("latest") => TxLog.currentVersion(spark, opts.path).getOrElse(0L)
        case Some(n) => n.toLong
        case None => 0L
      }
      fs.mkdirs(p.getParent)
      try {
        val out = fs.create(p, false)
        try out.write(base.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        base
      } catch {
        // lost a create race (e.g. a recovery retry of the same
        // query): the first writer's base is THE base — read it back
        case _: java.io.IOException if fs.exists(p) =>
          val in = fs.open(p)
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong
          finally in.close()
      }
    }
  }

  /** Stream schema: the head manifest's declared table schema, plus
    * `_change_type` in change-feed mode. The table must exist before
    * the stream starts (same as Delta). */
  def schemaFor(spark: SparkSession, opts: Opts): StructType = {
    val head = TxLog.currentVersion(spark, opts.path).getOrElse(
      throw new IllegalArgumentException(
        s"graft-txlog: no TxLog table at ${opts.path} — create it first"))
    val table = StructType.fromDDL(TxLog.manifest(spark, opts.path, head).schemaDdl)
    if (opts.cdf)
      StructType(table.fields :+ StructField("_change_type", StringType, nullable = false))
    else table
  }
}

/** The per-query source instance. Stateless beyond the rate-limit
  * cursor: offsets map to manifest versions, so batch contents derive
  * entirely from the immutable commit log. */
class TxLogSource(spark: SparkSession, opts: TxLogStream.Opts, base: Long)
    extends Source {
  import org.apache.spark.sql.functions.{col, lit}

  private val path = opts.path

  override val schema: StructType = TxLogStream.schemaFor(spark, opts)

  private val tableCols: Seq[String] =
    (if (opts.cdf) schema.fields.dropRight(1) else schema.fields).map(_.name).toSeq

  /** The rate-limit cursor: highest version the ENGINE is known to
    * have planned or committed. Starts at the persisted base and
    * syncs from every getBatch/commit the engine makes — including
    * the ones it makes while RECOVERING a checkpointed query (a
    * committed last batch replays as commit(), an uncommitted one as
    * getBatch()), so a restart resumes exactly where the offset log
    * says, never where this instance guesses. Correctness never
    * depends on it — offsets the engine already committed are simply
    * ignored when re-announced. */
  @volatile private var lastSeen: Long = base

  private def longOf(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] = {
    val head = TxLog.currentVersion(spark, path).getOrElse(return None)
    val capped = opts.maxVersionsPerBatch
      .fold(head)(m => math.min(head, lastSeen + m))
    if (capped > lastSeen) Some(LongOffset(capped)) else None
  }

  override def commit(end: Offset): Unit =
    lastSeen = math.max(lastSeen, longOf(end))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(longOf).getOrElse(base)
    val to = longOf(end)
    lastSeen = math.max(lastSeen, to)
    if (from >= to) return StreamBridge.emptyStreaming(spark, schema)
    val batch: DataFrame =
      if (!opts.cdf) {
        // (0, to] = the initial full snapshot; later ranges = manifest diff
        val df = if (from == 0L) TxLog.read(spark, path, Some(to))
                 else TxLog.appendsSince(spark, path, from, Some(to))
        checkNoDrift(df, to)
        df.select(tableCols.map(col): _*)
      } else {
        val df = if (from == 0L)
          TxLog.read(spark, path, Some(to))
            .withColumn("_change_type", lit("insert"))
        else TxLog.changes(spark, path, from, to, opts.keys,
          withPreimages = opts.withPreimages)
        checkNoDrift(df.drop("_change_type"), to)
        df.select((tableCols :+ "_change_type").map(col): _*)
      }
    StreamBridge.asStreamingLeaf(batch)
  }

  /** The stream's schema is pinned at start; if the table's schema
    * evolved since, fail the batch with instructions instead of
    * silently projecting the new columns away. */
  private def checkNoDrift(df: DataFrame, version: Long): Unit = {
    val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
    val want = tableCols.map(c => c -> schema(c).dataType)
    if (got.sortBy(_._1) != want.sortBy(_._1))
      throw new IllegalStateException(
        s"graft-txlog: table schema at $path changed mid-stream (v$version reads " +
          s"[${got.map(_._1).mkString(", ")}], stream pinned [${tableCols.mkString(", ")}]) " +
          "— restart the streaming query to pick up the evolved schema")
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"TxLogSource[$path, ${if (opts.cdf) "changeFeed" else "appends"}, base=v$base]"
}
