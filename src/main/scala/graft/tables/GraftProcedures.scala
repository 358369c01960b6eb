package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.{Catalog, TxLog}

/** The maintenance verbs as SQL stored procedures (the Iceberg `CALL`
  * surface), served by [[GraftCatalog]] as a `ProcedureCatalog`:
  *
  *   CALL graft.system.vacuum(table => 't', retain_versions => 3)
  *   CALL graft.system.optimize(table => 't', zorder_by => 'k1,k2')
  *   CALL graft.system.restore(table => 't', version => 4)
  *   CALL graft.system.build_bloom_index(table => 't', column => 'id')
  *
  * `table` accepts a registered NAME (resolved through the shared
  * registry) or a filesystem path. Results come back as one-row
  * relations via [[LocalScan]] — driver-sized by construction (a
  * version number, a count). The TXLOG verb strings remain the
  * path-first surface; procedures are the catalog-native spelling a
  * BI tool or notebook completes on. */
object GraftProcedures {

  private def p(name: String, dt: DataType) = ProcedureParameter.in(name, dt)
  private val S = org.apache.spark.sql.types.StringType
  private val L = org.apache.spark.sql.types.LongType
  private val B = org.apache.spark.sql.types.BooleanType

  private case class ResultScan(schema: StructType, out: Array[InternalRow])
    extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = schema
  }

  /** One procedure: fixed parameter list, one-row result. */
  private case class Proc(procName: String, doc: String,
                          params: Array[ProcedureParameter],
                          resultSchema: StructType,
                          body: (SparkSession, String, InternalRow) => InternalRow,
                          // ANN procs accept ANY catalog-visible relation
                          // as arg 0, not just graft-registry names —
                          // they resolve leniently and fall back to
                          // spark.table (see annSource)
                          lenientArg0: Boolean = false,
                          // the serving V2 catalog's own warehouse
                          // (threaded by [[load]]): names resolve here
                          // even when the session-conf registry key is
                          // unset — CALL through the catalog needs no
                          // side-channel configuration
                          catWarehouse: Option[String] = None)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // they commit/delete
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val target = input.getUTF8String(0).toString
      val whs = (spark.conf.getOption("graft.catalog.warehouse").toSeq ++
        catWarehouse.toSeq).distinct
      val path =
        if (!Catalog.isName(target) || whs.isEmpty) target
        else whs.flatMap(wh => Catalog.entriesAt(spark, wh).get(target))
          .headOption.getOrElse {
            if (lenientArg0) target
            else throw new IllegalArgumentException(
              s"$procName: no registered table '$target' under " +
                s"${whs.mkString(", ")}")
          }
      val row = body(spark, path, input)
      java.util.List.of[Scan](ResultScan(resultSchema, Array(row))).iterator()
    }
  }

  private val all: Map[String, Proc] = Seq(
    Proc("vacuum",
      "delete files no retained version references; returns the count",
      Array(p("table", S).build(),
        p("retain_versions", L).defaultValue("1").build(),
        p("retain_hours", org.apache.spark.sql.types.DoubleType)
          .defaultValue("CAST(NULL AS DOUBLE)").build(),
        p("dry_run", B).defaultValue("false").build()),
      StructType.fromDDL("deleted_files BIGINT"),
      (spark, path, in) => InternalRow(
        TxLog.vacuum(spark, path,
          keepVersions = in.getLong(1).toInt,
          dryRun = in.getBoolean(3),
          keepHours = if (in.isNullAt(2)) None else Some(in.getDouble(2)))
          .size.toLong)),
    Proc("optimize",
      "compact small files (optionally z-order clustered); returns the version",
      Array(p("table", S).build(),
        p("zorder_by", S).defaultValue("CAST(NULL AS STRING)").build()),
      StructType.fromDDL("version BIGINT"),
      (spark, path, in) => InternalRow(
        TxLog.compact(spark, path,
          zorderBy =
            if (in.isNullAt(1)) Nil
            else in.getUTF8String(1).toString.split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq))),
    Proc("analyze",
      "compute/refresh table-level column NDV sketches for CBO " +
        "(append-only history refreshes incrementally from the stored " +
        "sketches); returns per-column distinct-count estimates",
      Array(p("table", S).build(),
        p("columns", S).defaultValue("CAST(NULL AS STRING)").build()),
      StructType.fromDDL("analyzed_version BIGINT, ndv MAP<STRING, BIGINT>"),
      (spark, path, in) => {
        val cols =
          if (in.isNullAt(1)) Nil
          else in.getUTF8String(1).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
        val t = graft.storage.Analyze.analyze(spark, path, cols)
        InternalRow(t.analyzedVersion,
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            t.cols.toSeq.sortBy(_._1).map(c => UTF8String.fromString(c._1)).toArray,
            t.cols.toSeq.sortBy(_._1).map(_._2.ndv).toArray))
      }),
    Proc("restore",
      "roll the table back to a version (an O(1) ref commit)",
      Array(p("table", S).build(), p("version", L).build()),
      StructType.fromDDL("version BIGINT"),
      (spark, path, in) => InternalRow(
        TxLog.restore(spark, path, in.getLong(1)))),
    Proc("build_bloom_index",
      "build the point-lookup Bloom sidecars for a column; returns sidecars written",
      Array(p("table", S).build(), p("column", S).build()),
      StructType.fromDDL("sidecars BIGINT"),
      (spark, path, in) => InternalRow(
        TxLog.buildBloomIndex(spark, path,
          in.getUTF8String(1).toString).toLong)),
    Proc("transact",
      "run ';'-separated TXLOG DML statements as ONE atomic-outcome " +
        "transaction (journaled saga: on failure every committed table " +
        "RESTOREs to its pre-transaction head); returns the version per op",
      // the shared Proc shape resolves arg 0 as a table name — a
      // statement list is never a bare name, so it passes through
      // untouched and arrives here verbatim
      Array(p("statements", S).build()),
      StructType.fromDDL("versions ARRAY<BIGINT>"),
      (spark, statements, _) => InternalRow(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.tools.Sql.execTxnOps(spark, statements).toArray))),
    Proc("tag",
      "pin a retention-surviving named snapshot at a version (default: head)",
      Array(p("table", S).build(), p("name", S).build(),
        p("version", L).defaultValue("CAST(NULL AS BIGINT)").build()),
      StructType.fromDDL("version BIGINT"),
      (spark, path, in) => InternalRow({
        val v = if (in.isNullAt(2)) None else Some(in.getLong(2))
        TxLog.tag(spark, path, in.getUTF8String(1).toString, v)
        TxLog.tags(spark, path)(in.getUTF8String(1).toString)
      })),
    Proc("copy_into",
      "idempotent file-granular load: COPY INTO the table every " +
        "never-seen data file under source_dir (ledger + data land as " +
        "one journaled txn); pattern globs the source-relative path, " +
        "force re-loads seen files, merge_schema widens through the " +
        "evolve machinery; returns (files_loaded, version)",
      Array(p("table", S).build(), p("source_dir", S).build(),
        p("format", S).defaultValue("'parquet'").build(),
        p("pattern", S).defaultValue("CAST(NULL AS STRING)").build(),
        p("force", B).defaultValue("false").build(),
        p("merge_schema", B).defaultValue("false").build()),
      StructType.fromDDL("files_loaded BIGINT, version BIGINT"),
      (spark, path, in) => {
        val (n, v) = graft.storage.CopyInto.copyInto(spark, path,
          in.getUTF8String(1).toString,
          in.getUTF8String(2).toString.toLowerCase,
          pattern =
            if (in.isNullAt(3)) None else Some(in.getUTF8String(3).toString),
          force = in.getBoolean(4),
          mergeSchema = in.getBoolean(5))
        InternalRow(n.toLong, v)
      }),
    // the OFFLINE half of the ANN-through-SQL story: graft_ann/
    // graft_ann_pq serve an index a SQL-only user could not BUILD
    // until these — fit once here, query forever through the TVFs
    Proc("ann_build",
      "fit the IVF ANN index over a (vec_id, embedding) table into " +
        "index_path (nlist=0 derives ~sqrt(N); spill>1 multi-assigns); " +
        "returns nlist",
      Array(p("table", S).build(), p("index_path", S).build(),
        p("nlist", L).defaultValue("0").build(),
        p("spill", L).defaultValue("1").build()),
      StructType.fromDDL("nlist BIGINT"),
      (spark, path, in) => InternalRow(
        graft.operators.Ivf.fit(
          annSource(spark, path, in.getUTF8String(0).toString),
          in.getUTF8String(1).toString,
          nlist = in.getLong(2).toInt,
          spill = in.getLong(3).toInt).nlist.toLong),
      lenientArg0 = true),
    Proc("ann_append",
      "assign a new batch to an EXISTING IVF index (no refit, no " +
        "corpus rescan — the incremental-ingest path); returns rows " +
        "appended",
      Array(p("table", S).build(), p("index_path", S).build()),
      StructType.fromDDL("appended BIGINT"),
      (spark, path, in) => InternalRow({
        val src = annSource(spark, path, in.getUTF8String(0).toString)
        val idx = graft.operators.Ivf.load(spark,
          in.getUTF8String(1).toString)
        graft.operators.Ivf.append(spark, idx, src)
        src.count()
      }),
      lenientArg0 = true),
  ).map(x => x.procName -> x).toMap

  /** ANN procedures take their corpus from EITHER a TxLog table (name
    * or path — the resolved `path` reads transactionally) or any
    * catalog-visible relation (temp view, session table) under its
    * original name. */
  private def annSource(spark: SparkSession, path: String,
                        target: String): org.apache.spark.sql.DataFrame =
    if (TxLog.currentVersion(spark, path).isDefined) TxLog.read(spark, path)
    else spark.table(target)

  def load(catName: String, ident: Identifier,
           catWarehouse: Option[String] = None): UnboundProcedure = {
    require(ident.namespace.isEmpty ||
      ident.namespace.sameElements(Array("system")),
      s"$catName: procedures live under the 'system' namespace")
    all.getOrElse(ident.name, throw new RuntimeException(
      s"$catName: no procedure '${ident.name}' — " +
        s"have: ${all.keys.toSeq.sorted.mkString(", ")}"))
      .copy(catWarehouse = catWarehouse)
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      all.keys.toSeq.sorted.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty
}
