package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** COPY INTO — idempotent file-granular loading (the lakehouse ingest
  * verb: Databricks' `COPY INTO`, Snowflake's `COPY`): load into an
  * EXISTING TxLog table every data file under a source directory that
  * has not been loaded before, as one atomic-outcome unit. Re-running
  * after success loads nothing; re-running after a crash never
  * double-loads.
  *
  * The loaded-file ledger is ITSELF a TxLog table at
  * `<table>/_copy_into` (file, size, mtime), and the data append + the
  * ledger append run as ONE journaled [[Txn]] with the table's own
  * directory as journal root — a crash between the two commits
  * compensates on the next [[Txn.recover]] (or fails loud and
  * restored on a live error), so "loaded" and "recorded as loaded"
  * can never diverge durably. A source file re-presents as NEW when
  * its (path, size, mtime) identity changed — the rewritten-file
  * semantics CDC backfills expect (an unchanged re-listing is a
  * no-op).
  *
  * Scale: the ledger is file-count-sized (metadata, not data); the
  * diff is one listing + one ledger read; the load is one ordinary
  * append of exactly the new files. Reference shape: the gwasDB ETL
  * re-runs per-chromosome TSV loads and must not double-insert
  * (R/wrangle_data.Rmd's load loop) — this is that contract, made
  * transactional. */
object CopyInto {

  private def dataExts(format: String): Seq[String] = format match {
    case "parquet" => Seq(".parquet")
    case "jsonl" => Seq(".json", ".jsonl")
    case other => throw new IllegalArgumentException(
      s"CopyInto: unsupported format '$other' — parquet or jsonl")
  }

  /** (relative-ish display path, absolute path, size, mtime) of every
    * data file under `srcDir`, recursive, hidden files skipped. */
  private def listSource(spark: SparkSession, srcDir: String,
                         format: String): Seq[(String, Long, Long)] = {
    val root = new Path(srcDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"CopyInto: no source directory at $srcDir")
    val exts = dataExts(format)
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && exts.exists(name.endsWith(_)) &&
          !name.startsWith("_") && !name.startsWith("."))
        // full URI string: scheme-stable ledger identity, and exactly
        // what the reader re-opens on mixed-scheme deployments
        out += ((st.getPath.toString, st.getLen, st.getModificationTime))
    }
    out.toSeq.sortBy(_._1)
  }

  /** Run the copy. Returns (files loaded, table version after — the
    * pre-call head when nothing was new). */
  def copyInto(spark: SparkSession, path: String, srcDir: String,
               format: String = "parquet"): (Int, Long) = {
    import spark.implicits._
    val headV = TxLog.currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"CopyInto: no table at $path — COPY INTO loads an EXISTING " +
          "table (create it first; the declared schema is the contract " +
          "incoming files are vetted against)"))
    val ledger = s"$path/_copy_into"
    if (TxLog.currentVersion(spark, ledger).isEmpty)
      TxLog.create(Seq.empty[(String, Long, Long)]
        .toDF("file", "size", "mtime"), ledger)
    val loaded = TxLog.read(spark, ledger)
      .select("file", "size", "mtime")
      .as[(String, Long, Long)].collect().toSet
    val fresh = listSource(spark, srcDir, format).filterNot(loaded.contains)
    if (fresh.isEmpty) return (0, headV)
    val declared = org.apache.spark.sql.types.StructType.fromDDL(
      TxLog.manifest(spark, path, headV).schemaDdl)
    val paths = fresh.map(_._1)
    val reader = spark.read.schema(declared)
    val df = (format match {
      case "parquet" => reader.parquet(paths: _*)
      case "jsonl" => reader.json(paths: _*)
    }).select(declared.fieldNames.map(col).toIndexedSeq: _*)
    // ONE journaled transaction: the data lands iff the ledger
    // records it — crash between the two compensates
    val versions = Txn.transact(spark, path, Seq(
      Txn.Append(path, df),
      Txn.Append(ledger, fresh.toDF("file", "size", "mtime"))))
    (fresh.size, versions.head)
  }
}
