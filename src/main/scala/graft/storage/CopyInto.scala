package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_millis}

/** COPY INTO — idempotent file-granular loading (the lakehouse ingest
  * verb: Databricks' `COPY INTO`, Snowflake's `COPY`): load into an
  * EXISTING TxLog table every data file under a source directory that
  * has not been loaded before, as one atomic-outcome unit. Re-running
  * after success loads nothing, and every entry runs [[Txn.recover]]
  * first, so re-running after a crash compensates the half-landed
  * transaction before anything new stages — "loaded" and "recorded as
  * loaded" can never diverge durably. A source file re-presents as NEW
  * when its (path, size, mtime) identity changed — the rewritten-file
  * semantics CDC backfills expect (an unchanged re-listing is a no-op).
  *
  * The loaded-file ledger is ITSELF a TxLog table at
  * `<table>/_copy_into` (file, size, mtime), and the data append + the
  * ledger append run as ONE journaled [[Txn]] with the table's own
  * directory as journal root.
  *
  * Options (the Databricks COPY INTO option set):
  *  - `pattern` — a glob over the source-RELATIVE path (`*` within a
  *    segment, `**` across, `?`, `{a,b}`), so a 100 TB drop dir loads
  *    one prefix at a time;
  *  - `force` — re-load files the ledger already records (the
  *    "backfill anyway" switch); the ledger stays deduplicated — only
  *    never-seen identities append to it;
  *  - `mergeSchema` — incoming files may carry new/widened columns,
  *    routed through the append path's existing widen/evolve
  *    machinery. Without it, files load PROJECTED to the declared
  *    schema: extra columns are ignored, missing columns read null —
  *    and CHECK constraints still vet every row.
  *
  * Scale (r15 advice closed): the listing is Spark's own parallel
  * file index (`binaryFile` — content column never read), the
  * never-seen diff is a LEFT ANTI-JOIN of that listing against the
  * ledger TABLE, and only the fresh tail (batch-bounded) ever reaches
  * the driver — a year-of-crawls ledger (10^6-10^7 rows) is never
  * collected. Reference shape: the gwasDB ETL re-runs per-chromosome
  * TSV loads and must not double-insert (R/wrangle_data.Rmd's load
  * loop) — this is that contract, made transactional. */
object CopyInto {

  private def defaultGlob(format: String): String = format match {
    case "parquet" => "*.parquet"
    case "jsonl" => "*.{json,jsonl}"
    case other => throw new IllegalArgumentException(
      s"CopyInto: unsupported format '$other' — parquet or jsonl")
  }

  /** PATTERN glob → anchored regex over the source-relative path:
    * `**` crosses directory boundaries, `*`/`?` stay within one
    * segment, `{a,b}` alternates. */
  private[storage] def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var depth = 0
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          sb.append(".*"); i += 1
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '{' => depth += 1; sb.append("(?:")
        case '}' =>
          require(depth > 0, s"CopyInto: unbalanced '}' in pattern '$glob'")
          depth -= 1; sb.append(")")
        case ',' if depth > 0 => sb.append("|")
        case c if "\\.[]()^$+|,".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    require(depth == 0, s"CopyInto: unbalanced '{' in pattern '$glob'")
    sb.append("$").toString
  }

  /** DISTRIBUTED source listing: (file, size, mtime) of every data file
    * under `srcDir`, via Spark's parallel file index (the binaryFile
    * format — selecting only metadata columns never opens a file).
    * Paths normalize through `new Path(URI)` so the ledger identity is
    * byte-stable against URI-encoding/slash-count spelling drift
    * between listers. Hidden files/dirs (`_`/`.` prefixes) are skipped
    * by the file index itself. */
  private def listSource(spark: SparkSession, srcDir: String,
                         format: String, pattern: Option[String]): DataFrame = {
    import spark.implicits._
    val root = new Path(srcDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"CopyInto: no source directory at $srcDir")
    val rootUri = fs.makeQualified(root).toString.stripSuffix("/")
    val listed = spark.read.format("binaryFile")
      .option("pathGlobFilter", defaultGlob(format))
      .option("recursiveFileLookup", "true")
      .load(srcDir)
      .select(col("path"), col("length"),
        unix_millis(col("modificationTime")).as("mtime"))
      .as[(String, Long, Long)]
      .map { case (p, len, mt) =>
        val norm = new Path(new java.net.URI(p)).toString
        val rel =
          if (norm.startsWith(rootUri + "/")) norm.drop(rootUri.length + 1)
          else norm.split('/').last
        (norm, rel, len, mt)
      }.toDF("file", "_rel", "size", "mtime")
    pattern.fold(listed.drop("_rel")) { g =>
      listed.filter(col("_rel").rlike(globToRegex(g))).drop("_rel")
    }
  }

  /** Run the copy. Returns (files loaded, table version after — the
    * pre-call head when nothing was new). */
  def copyInto(spark: SparkSession, path: String, srcDir: String,
               format: String = "parquet", pattern: Option[String] = None,
               force: Boolean = false,
               mergeSchema: Boolean = false): (Int, Long) = {
    import spark.implicits._
    // crash repair FIRST (r15 advice): a crash between the data commit
    // and the ledger commit leaves a journal; compensating it here
    // restores the data head, so the re-run below cannot double-load.
    // A journal recovery could not settle (an interleaved writer moved
    // the head) refuses loudly — proceeding could duplicate rows.
    Txn.recover(spark, path).collect().foreach { r =>
      val stuck = r.getSeq[String](2) ++ r.getSeq[String](3)
      require(stuck.isEmpty,
        s"CopyInto: crashed transaction ${r.getString(0)} at $path could " +
          s"not be compensated (conflicted/indeterminate: " +
          s"${stuck.mkString(", ")}) — resolve it before loading")
    }
    val headV = TxLog.currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"CopyInto: no table at $path — COPY INTO loads an EXISTING " +
          "table (create it first; the declared schema is the contract " +
          "incoming files are vetted against)"))
    val ledger = s"$path/_copy_into"
    if (TxLog.currentVersion(spark, ledger).isEmpty)
      TxLog.create(Seq.empty[(String, Long, Long)]
        .toDF("file", "size", "mtime"), ledger)
    val listing = listSource(spark, srcDir, format, pattern)
    // the never-seen diff stays DISTRIBUTED (anti-join against the
    // ledger table); only the fresh tail — bounded by this batch —
    // collects. FORCE re-loads the whole matching listing but records
    // only the never-seen identities, so the ledger stays a set.
    val unseen = listing.join(
        TxLog.read(spark, ledger).select("file", "size", "mtime"),
        Seq("file", "size", "mtime"), "left_anti")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val toLoad =
      if (!force) unseen
      else listing.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    if (toLoad.isEmpty) return (0, headV)
    val declared = org.apache.spark.sql.types.StructType.fromDDL(
      TxLog.manifest(spark, path, headV).schemaDdl)
    val paths = toLoad.map(_._1)
    val df =
      if (mergeSchema) format match {
        // inferred schema: new/widened columns ride the append path's
        // own evolve machinery (checkSchema widen + missing-col fill)
        case "parquet" => spark.read.option("mergeSchema", "true")
          .parquet(paths: _*)
        case "jsonl" => spark.read.json(paths: _*)
      } else {
        val reader = spark.read.schema(declared)
        (format match {
          case "parquet" => reader.parquet(paths: _*)
          case "jsonl" => reader.json(paths: _*)
        }).select(declared.fieldNames.map(col).toIndexedSeq: _*)
      }
    // ONE journaled transaction: the data lands iff the ledger
    // records it — crash between the two compensates on re-entry
    val ops = Seq(Txn.Append(path, df, evolveSchema = mergeSchema)) ++
      (if (unseen.nonEmpty)
        Seq(Txn.Append(ledger, unseen.toDF("file", "size", "mtime")))
       else Nil)
    val versions = Txn.transact(spark, path, ops)
    (toLoad.size, versions.head)
  }
}
