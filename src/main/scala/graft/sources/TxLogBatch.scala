package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{NumericType, StructType}

import graft.storage.TxLog

/** The BATCH read path for `spark.read.format("graft-txlog")` — the
  * Delta pattern: a plain `BaseRelation` backed by [[TxLogFileIndex]],
  * a manifest-driven `FileIndex`, wrapped in Spark's own
  * `HadoopFsRelation` + `ParquetFileFormat`. Everything downstream is
  * stock Spark: vectorized parquet, whole-stage codegen, filter and
  * column pushdown — the index only answers "which files", exactly
  * like Delta's TahoeFileIndex.
  *
  * What the index adds over a directory listing:
  *  - the file list IS the resolved manifest (snapshot isolation and
  *    `versionAsOf`/`timestampAsOf` time travel for free — no
  *    directory scan, no eventual-consistency caveats);
  *  - PARTITION pruning evaluates the scan's partition filters
  *    against each manifest partition directory's typed values —
  *    driver-side, partition-count bounded;
  *  - DATA skipping evaluates the scan's data filters against the
  *    manifest's per-file min/max stats ([[TxLog.prunedFiles]]'s rule
  *    lifted into the planner): a `WHERE k = 5` over a k-clustered
  *    table plans a few files before a single task launches. Files
  *    without stats are conservatively kept — pruning is an
  *    optimization, never a filter (the exact predicate still runs on
  *    the scan).
  */
class TxLogFileIndex(spark: SparkSession, tablePath: String,
                     m: TxLog.Manifest) extends FileIndex {

  private val declared = StructType.fromDDL(m.schemaDdl)
  private val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
  /** Logical → physical name (identity when never renamed): partition
    * DIRECTORIES and stats keys live next to the files and spell
    * physical names; the relation's schema and the scan's filters
    * spell logical ones. */
  private def physName(l: String): String =
    m.colMap.find(_._1 == l).map(_._2).getOrElse(l)
  override val partitionSchema: StructType =
    StructType(m.partitionCols.map(declared.apply))

  private def isAbs(f: String): Boolean = f.startsWith("/") || f.contains("://")
  private def absPath(f: String): Path =
    if (isAbs(f)) new Path(f) else new Path(new Path(tablePath, "data"), f)
  /** Data-root-relative form (clone refs resolve through their own
    * `/data/`), the key the manifest's stats are expressed in. */
  private def dirPartOf(f: String): String = {
    val rel =
      if (!isAbs(f)) f
      else {
        val i = f.lastIndexOf("/data/")
        if (i >= 0) f.substring(i + "/data/".length) else f.split('/').last
      }
    rel.split('/').dropRight(1).mkString("/")
  }

  /** One FileStatus per manifest entry — resolved once at index
    * construction (file-count-bounded driver work, same class as every
    * manifest walk) so repeated planning never re-stats. */
  private val statuses: Seq[(String, FileStatus)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    m.files.map { f =>
      val p = absPath(f)
      f -> p.getFileSystem(conf).getFileStatus(p)
    }
  }

  /** Partition-dir string → typed InternalRow of the partition values
    * (unescaped, `__HIVE_DEFAULT_PARTITION__` → null, cast via the
    * declared schema exactly like [[TxLog.read]]'s contract). */
  private def valuesOf(dir: String): InternalRow = {
    if (partitionSchema.isEmpty) return InternalRow.empty
    val byName = dir.split('/').filter(_.nonEmpty).map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"TxLogFileIndex: malformed partition dir '$dir'")
      seg.substring(0, i) -> seg.substring(i + 1)
    }.toMap
    InternalRow.fromSeq(partitionSchema.map { field =>
      // the directory spells the PHYSICAL name (renames never move files)
      val raw = byName.getOrElse(physName(field.name),
        ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      // SESSION tz, not UTC: stageIn's partitionBy writer formats
      // timestamp partition values in the session timezone, so the
      // cast back must use the same zone or the relation would surface
      // shifted instants (and prune against the wrong ones)
      else Cast(Literal(ExternalCatalogUtils.unescapePathName(raw)),
        field.dataType, Some(sessionTz)).eval(null)
    })
  }

  private val byDir: Seq[(String, InternalRow, Seq[(String, FileStatus)])] =
    statuses.groupBy { case (f, _) => dirPartOf(f) }.toSeq.sortBy(_._1)
      .map { case (dir, fs) => (dir, valuesOf(dir), fs) }

  /** Bind by NAME against the partition schema — the filters arrive
    * referencing the relation's attributes. */
  private def pruneDirs(dirs: Seq[(String, InternalRow, Seq[(String, FileStatus)])],
                        partitionFilters: Seq[Expression]) =
    if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
    else {
      val bound = partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val i = partitionSchema.fieldIndex(a.name)
          BoundReference(i, partitionSchema(i).dataType, nullable = true)
      }
      val pred = Predicate.createInterpreted(bound)
      pred.initialize(0)
      dirs.filter { case (_, values, _) => pred.eval(values) }
    }

  /** Min/max skip vote for ONE simple comparison on a stats-tracked
    * column; None = not skippable by this filter. Bounds are the
    * manifest's string encoding — numeric columns compare as exact
    * decimals, everything else lexicographically (the stats contract).
    */
  private def rangeOf(e: Expression): Option[(String, Option[String], Option[String])] = {
    // Encode the literal EXACTLY like collectStats encodes the file
    // bounds: TIMESTAMP literals as `us:<epoch micros>` (the stats-v2
    // timezone-free encoding — a Catalyst timestamp literal's value IS
    // micros, so no zone ever enters the comparison), everything else
    // Cast-to-string in the session timezone — so a DATE literal
    // compares as '2021-01-02', never as its raw Catalyst days value
    // (which would lexicographically mis-prune and silently lose rows).
    def lit(l: Literal): Option[String] =
      Option(l.value).flatMap { v =>
        if (l.dataType == org.apache.spark.sql.types.TimestampType)
          Some(TxLog.TsStatsPrefix + v.toString)
        else Option(Cast(l, org.apache.spark.sql.types.StringType,
          Some(sessionTz)).eval(null)).map(_.toString)
      }
    e match {
      case EqualTo(a: AttributeReference, l: Literal) =>
        lit(l).map(v => (a.name, Some(v), Some(v)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        lit(l).map(v => (a.name, Some(v), Some(v)))
      case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
        lit(l).map(v => (a.name, Some(v), Some(v)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        lit(l).map(v => (a.name, Some(v), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        lit(l).map(v => (a.name, Some(v), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        lit(l).map(v => (a.name, None, Some(v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        lit(l).map(v => (a.name, None, Some(v)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        lit(l).map(v => (a.name, None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        lit(l).map(v => (a.name, None, Some(v)))
      case LessThan(l: Literal, a: AttributeReference) =>
        lit(l).map(v => (a.name, Some(v), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        lit(l).map(v => (a.name, Some(v), None))
      case _ => None
    }
  }

  private def admits(entry: String, colName: String,
                     lo: Option[String], hi: Option[String]): Boolean =
    m.fileStats.get(entry).flatMap(_.get(physName(colName))) match {
      case None => true // no stats: conservatively kept
      case Some((mn, mx)) =>
        declared(colName).dataType match {
          case _: NumericType =>
            // NaN/Infinity bounds (a double file's min/max casts to
            // 'NaN'/'Infinity') don't parse as decimals — keep the
            // file; pruning is an optimization, never a filter
            def geq(a: String, b: String) =
              scala.util.Try(BigDecimal(a) >= BigDecimal(b)).getOrElse(true)
            lo.forall(l => geq(mx, l)) && hi.forall(h => geq(h, mn))
          case org.apache.spark.sql.types.TimestampType =>
            // stats-v2 `us:`-micros compare numerically; a LEGACY
            // (session-tz-string) entry never votes — per-entry
            // fail-open keeps mixed-era tables exact
            def geq(a: String, b: String) =
              (for { x <- TxLog.tsStatsDecode(a); y <- TxLog.tsStatsDecode(b) }
                yield x >= y).getOrElse(true)
            lo.forall(l => geq(mx, l)) && hi.forall(h => geq(h, mn))
          case _ =>
            lo.forall(l => mx >= l) && hi.forall(h => h >= mn)
        }
    }

  /** Only types whose stats encoding is ORDER-PRESERVING may vote:
    * numeric and timestamp (compared as decimals — timestamps ride the
    * stats-v2 `us:`-micros encoding, timezone-free), string (identity)
    * and date ('yyyy-MM-dd' — zero-padded, so lexicographic IS
    * chronological and no zone enters a date's rendering). Everything
    * else (binary, boolean, intervals) is conservatively unprunable. */
  private def votableType(colName: String): Boolean =
    declared(colName).dataType match {
      case _: NumericType => true
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }

  private def skipByStats(files: Seq[(String, FileStatus)],
                          dataFilters: Seq[Expression]) = {
    val votes = dataFilters.flatMap(rangeOf)
      .filter { case (c, _, _) =>
        m.statsCols.contains(physName(c)) && votableType(c) }
    if (votes.isEmpty) files
    else files.filter { case (entry, _) =>
      votes.forall { case (c, lo, hi) => admits(entry, c, lo, hi) }
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    pruneDirs(byDir, partitionFilters).map { case (_, values, fs) =>
      PartitionDirectory(values, skipByStats(fs, dataFilters).map(_._2).toArray)
    }

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))
  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = () // a manifest snapshot is immutable
  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum
}

/** The table's parquet format: stock `ParquetFileFormat` plus the two
  * manifest-driven concerns a TxLog snapshot adds —
  *
  * **Column mapping** (`colMap` nonEmpty): a renamed column's data
  * still lives under its ORIGINAL physical name in every file, so the
  * required schema and the pushed filters translate logical→physical
  * before reaching the reader. `InternalRow`s are positional — the
  * translation is purely schema-level, zero per-row work, and
  * vectorized/columnar delivery is untouched.
  *
  * **Deletion vectors** (`dvFiles` nonEmpty): the seam that makes
  * MERGE-ON-READ tables batch-mountable. Same trick Delta uses —
  * append Spark's TEMPORARY ROW-INDEX column to the required schema
  * (the parquet readers generate it split- and pushdown-safely from
  * the file's row-group offsets), drop rows whose (file, row_index)
  * is in the snapshot's deletion vectors, then strip the column back
  * out. Everything else is stock: filter pushdown, column pruning and
  * split planning all still apply (a pruned row group just never
  * surfaces its indexes — the DV filter only ever REMOVES rows, so
  * skipping is unaffected).
  *
  * Row-based delivery ([[supportBatch]] = false) only under DVs: DV
  * filtering is per-row, and a DV-bearing snapshot is transitional by
  * design — OPTIMIZE/compact materializes the deletes and the
  * relation goes back to columnar.
  *
  * The DV map (file-key → sorted deleted row indexes) is
  * DELETE-SIZED, loaded once driver-side and broadcast — the same
  * budget TxLog.read's anti-join already spends, minus the join
  * (above [[TxLogBatch.dvBroadcastMaxRows]] the relation falls back
  * to the anti-join seam instead; see [[TxLogJoinRelation]]). */
class TxLogParquetFileFormat(
    val tablePath: String,
    val colMap: Seq[(String, String)],
    val dvFiles: Seq[String],
    dvBySuffix: org.apache.spark.broadcast.Broadcast[Map[String, Array[Long]]])
  extends org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat {

  import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat => PFF}
  import org.apache.spark.sql.sources

  override def supportBatch(sparkSession: SparkSession,
                            schema: StructType): Boolean =
    dvFiles.isEmpty && super.supportBatch(sparkSession, schema)

  /** Logical → physical for a (possibly dotted) pushed-filter or
    * schema name; only top-level columns rename, nested paths keep
    * their tail. */
  private def physName(n: String): String =
    colMap.find(_._1 == n).map(_._2).getOrElse {
      val dot = n.indexOf('.')
      if (dot < 0) n
      else colMap.find(_._1 == n.substring(0, dot))
        .map(_._2 + n.substring(dot)).getOrElse(n)
    }

  private def physFilter(f: sources.Filter): Option[sources.Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(physName(a), v))
    case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(physName(a), v))
    case sources.GreaterThan(a, v) => Some(sources.GreaterThan(physName(a), v))
    case sources.GreaterThanOrEqual(a, v) =>
      Some(sources.GreaterThanOrEqual(physName(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(physName(a), v))
    case sources.LessThanOrEqual(a, v) =>
      Some(sources.LessThanOrEqual(physName(a), v))
    case sources.In(a, vs) => Some(sources.In(physName(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(physName(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(physName(a)))
    case sources.StringStartsWith(a, v) =>
      Some(sources.StringStartsWith(physName(a), v))
    case sources.StringEndsWith(a, v) =>
      Some(sources.StringEndsWith(physName(a), v))
    case sources.StringContains(a, v) =>
      Some(sources.StringContains(physName(a), v))
    case sources.And(l, r) =>
      for { x <- physFilter(l); y <- physFilter(r) } yield sources.And(x, y)
    case sources.Or(l, r) =>
      for { x <- physFilter(l); y <- physFilter(r) } yield sources.Or(x, y)
    case sources.Not(c) => physFilter(c).map(sources.Not)
    // an unrecognized filter shape could smuggle a logical name past
    // the rename — drop it (pushdown is an optimization; the scan's
    // Filter node still evaluates the exact predicate)
    case _ => None
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[InternalRow] = {
    // ---- column mapping: rename schemas + filters, positions stay ----
    val physData = StructType(dataSchema.fields.map(f => f.copy(name = physName(f.name))))
    val physRequired0 = StructType(requiredSchema.fields.map(f => f.copy(name = physName(f.name))))
    val physFilters =
      if (colMap.isEmpty) filters else filters.flatMap(physFilter)
    if (dvFiles.isEmpty)
      return super.buildReaderWithPartitionValues(sparkSession, physData,
        partitionSchema, physRequired0, physFilters, options, hadoopConf)
    // ---- deletion vectors: row-index column + per-file anti-filter ----
    val tmpName = PFF.ROW_INDEX_TEMPORARY_COLUMN_NAME
    // the scan may ALREADY request row indexes (_metadata.row_index);
    // reuse its column instead of requesting a duplicate
    val hasIdx = physRequired0.fieldNames.contains(tmpName)
    val readSchema =
      if (hasIdx) physRequired0
      else StructType(physRequired0.fields :+
        // NULLABLE is load-bearing: the vectorized reader only routes a
        // requested-but-absent column into its row-index synthesis when
        // checkColumn classifies it as missing-and-optional — a required
        // missing column fails the scan before the name is ever matched
        // (VectorizedParquetRecordReader.checkColumn → missingColumns →
        // ParquetColumnVector's isRowIndexColumn branch)
        org.apache.spark.sql.types.StructField(tmpName,
          org.apache.spark.sql.types.LongType, nullable = true))
    val base = super.buildReaderWithPartitionValues(sparkSession, physData,
      partitionSchema, readSchema, physFilters, options, hadoopConf)
    val idxOrd = readSchema.fieldIndex(tmpName)
    // the reader's row layout: required fields then partition values
    val outFields = readSchema.fields ++ partitionSchema.fields
    val dv = dvBySuffix
    file => {
      // the same key the DV writer computed (input_file_name's
      // encoding): data-root-relative suffix after the last '/data/'
      val url = file.urlEncodedPath
      val i = url.lastIndexOf("/data/")
      // mirror the writer EXACTLY: substring_index(url, '/data/', -1)
      // returns the WHOLE url when '/data/' is absent — a bare-filename
      // fallback here would never match such DV entries and deleted
      // rows would silently resurrect
      val key = if (i >= 0) url.substring(i + "/data/".length) else url
      val deleted = dv.value.getOrElse(key, null)
      val rows0 = base(file)
      val rows =
        if (deleted == null) rows0
        else rows0.filter(r =>
          java.util.Arrays.binarySearch(deleted, r.getLong(idxOrd)) < 0)
      if (hasIdx) rows // the scan asked for the index column — keep it
      else {
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(outFields.indices.filterNot(_ == idxOrd).map(j =>
            BoundReference(j, outFields(j).dataType, outFields(j).nullable)))
        rows.map(proj)
      }
    }
  }

  // distinct DV/rename states must never plan-cache/exchange-reuse as
  // equal (stock ParquetFileFormat.equals treats ALL instances as equal)
  override def equals(other: Any): Boolean = other match {
    case o: TxLogParquetFileFormat =>
      o.tablePath == tablePath && o.colMap == colMap && o.dvFiles == dvFiles
    case _ => false
  }
  override def hashCode(): Int = (tablePath, colMap, dvFiles).hashCode()
  override def toString: String =
    s"GraftTxLogParquet(renames=${colMap.size}, dv=${dvFiles.size})"
}

object TxLogBatch {
  /** Driver-side load of a snapshot's deletion vectors into
    * (file-key → SORTED deleted row indexes) — delete-sized, the same
    * rows [[TxLog.read]]'s anti-join streams, collected once and
    * broadcast so every scan task probes a local array. */
  def loadDvMap(spark: SparkSession, tablePath: String,
                m: TxLog.Manifest): Map[String, Array[Long]] =
    spark.read
      .parquet(m.dv.map { case (f, _) => TxLog.dvPath(tablePath, f) }: _*)
      .select("f", "row_index").collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        val a = rows.map(_.getLong(1)); java.util.Arrays.sort(a); k -> a
      }

  /** Resolve the (path, version) a batch read targets from the
    * reader options: `versionAsOf` (a version number) or
    * `timestampAsOf` (ISO instant / SQL timestamp) — absent = head. */
  def resolve(spark: SparkSession,
              parameters: Map[String, String]): (String, TxLog.Manifest) = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = p.getOrElse("path", throw new IllegalArgumentException(
      "graft-txlog: option 'path' (the TxLog table directory) is required"))
    val version = p.get("versionasof").map(_.toLong)
      .orElse(p.get("timestampasof").map(ts =>
        TxLog.versionAt(spark, path, TxLog.parseTsMillis(ts))))
      .orElse(TxLog.currentVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-txlog: no table at $path"))
    val m = TxLog.manifest(spark, path, version)
    // column-mapped (renamed) tables need the read-side alias layer;
    // HadoopFsRelation reads parquet columns by their file names, so it
    // would silently surface nulls for a renamed column — refuse loudly
    require(m.colMap.isEmpty,
      s"graft-txlog: table at $path uses column mapping (renamed columns); " +
        "the batch relation does not alias physical names yet — read via " +
        "TxLog.read")
    (path, m)
  }
}
