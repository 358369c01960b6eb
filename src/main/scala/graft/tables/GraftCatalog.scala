package graft.tables

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Literal => VLiteral, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, EqualTo, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.storage.{Catalog, TxLog}

/** The DataSource V2 `TableCatalog` over graft's named-table registry —
  * the front door that lets Spark's OWN resolver serve graft tables by
  * name, which is the reference's actual UX (gwasDB/app.R:133 reads
  * `tbl(con, "combined")`: a named table in a catalog, SQL pushed at
  * it by dbplyr). With
  *
  *   spark.sql.catalog.graft           = graft.tables.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/lake
  *
  * plain SQL works end to end:
  *
  *   CREATE TABLE graft.t (k BIGINT, v STRING) PARTITIONED BY (bucket(16, k))
  *   CREATE TABLE graft.t2 AS SELECT ...
  *   SELECT * FROM graft.t [VERSION AS OF 3]
  *   INSERT INTO graft.t SELECT ...
  *   INSERT OVERWRITE graft.t SELECT ...
  *   DELETE FROM graft.t WHERE ... / UPDATE graft.t SET ... / MERGE INTO graft.t ...
  *
  * Division of labor (the Delta pattern):
  *  - this catalog resolves names → [[GraftTable]]s and handles DDL;
  *  - WRITES ride Spark's V1-fallback write machinery ([[V1Write]] →
  *    the transactional TxLog verbs) — append, truncate-overwrite, and
  *    static-partition overwrite map to append / createOrReplace /
  *    replacePartitions, each ONE atomic commit;
  *  - READS and row-level DML (DELETE/UPDATE/MERGE) are rewritten by
  *    [[GraftAnalysis]] (injected via `graft.GraftExtensions`) onto the
  *    V1 `HadoopFsRelation` mount and the TxLog verbs, so a catalog
  *    read plans IDENTICALLY to `spark.read.format("graft-txlog")`:
  *    stock vectorized parquet, codegen, filter/column pushdown,
  *    manifest file pruning. A V2 `ScanBuilder` could not return that
  *    relation — the rewrite can, which is why reads convert at
  *    analysis instead of implementing `SupportsRead`.
  *
  * The registry backing names is [[graft.storage.Catalog]]'s single
  * JSON file, so Scala-API names, TXLOG-verb names, and `graft.*` SQL
  * names are one namespace. */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    // the catalog's own warehouse rides along, so CALL targets resolve
    // by name with no session-conf side channel
    GraftProcedures.load(catName, ident,
      warehouseOpt.orElse(
        spark.conf.getOption("graft.catalog.warehouse")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)
  private var catName: String = "graft"
  private var warehouseOpt: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouseOpt = Option(options.get("warehouse"))
  }
  override def name(): String = catName

  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def spark: SparkSession = SparkSession.active
  private def warehouse: String =
    warehouseOpt.orElse(spark.conf.getOption("graft.catalog.warehouse"))
      .getOrElse(throw new IllegalStateException(
        s"catalog $catName: set spark.sql.catalog.$catName.warehouse (or " +
          "graft.catalog.warehouse) to the lake directory"))
  /** TABLE rows of the registry (VIEW rows carry the `view:` value
    * tag and live in [[viewEntries]] — one file, one namespace). */
  private def entries: Map[String, String] =
    Catalog.entriesAt(spark, warehouse)
      .filterNot(_._2.startsWith(GraftCatalog.ViewTag))

  /** Any registry row — table or view — owns the name. */
  private def nameTaken(n: String): Boolean =
    Catalog.entriesAt(spark, warehouse).contains(n)

  /** VIEW rows: name → the JSON payload [[GraftView]] decodes. */
  private def viewEntries: Map[String, String] =
    Catalog.entriesAt(spark, warehouse)
      .collect { case (n, v) if v.startsWith(GraftCatalog.ViewTag) =>
        n -> v.stripPrefix(GraftCatalog.ViewTag) }

  /** Tables live in the catalog root; `graft.t` and `graft.default.t`
    * both resolve (some tools always qualify with a namespace). */
  private def checkNs(ns: Array[String]): Unit =
    if (!(ns.isEmpty || ns.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(ns)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNs(namespace)
    entries.keys.toSeq.sorted.map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      entries.contains(ident.name)

  private def pathOf(ident: Identifier): String = {
    checkNs(ident.namespace)
    entries.getOrElse(ident.name, throw new NoSuchTableException(ident))
  }

  override def loadTable(ident: Identifier): Table =
    GraftTable(ident.name, pathOf(ident), None)

  /** `VERSION AS OF x` — a version number or a retention-pinned tag. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    val v = version.toLongOption.getOrElse(
      TxLog.tags(spark, path).getOrElse(version,
        throw new IllegalArgumentException(
          s"$catName.${ident.name}: '$version' is neither a version " +
            "number nor a tag")))
    GraftTable(ident.name, path, Some(v))
  }

  /** `TIMESTAMP AS OF x` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    GraftTable(ident.name, path,
      Some(TxLog.versionAt(spark, path, timestamp / 1000L)))
  }

  /** The Column[]-based door Spark actually calls for CREATE TABLE:
    * identity specs live ONLY on the V2 `Column` (the StructType
    * conversion Spark would apply for the deprecated overload DROPS
    * them), so this override extracts them before delegating — a
    * `GENERATED ALWAYS AS IDENTITY` column becomes the engine's
    * identity policy ([[TxLog.setColumnIdentity]]) in the same create.
    * Column DEFAULTs re-encode as the CURRENT_DEFAULT metadata the
    * schema-based path already adopts. */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val identities = columns.toSeq.flatMap { c =>
      Option(c.identityColumnSpec()).map { s =>
        if (s.isAllowExplicitInsert) throw new UnsupportedOperationException(
          s"$catName.${ident.name}.${c.name}: GENERATED BY DEFAULT AS " +
            "IDENTITY is not supported — use GENERATED ALWAYS AS IDENTITY")
        require(c.dataType == org.apache.spark.sql.types.LongType,
          s"$catName.${ident.name}.${c.name}: IDENTITY requires BIGINT, " +
            s"got ${c.dataType.sql}")
        (c.name, s.getStart, s.getStep)
      }
    }
    val schema = StructType(columns.map { c =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.defaultValue()).foreach(dv =>
        mb.putString("CURRENT_DEFAULT", dv.getSql))
      org.apache.spark.sql.types.StructField(
        c.name, c.dataType, c.nullable, mb.build())
    })
    // pre-validate what setColumnIdentity would otherwise refuse after
    // the data dir exists — a refused CREATE should create NOTHING
    val layoutSrcs =
      partitions.flatMap(_.references().flatMap(_.fieldNames())).toSet
    identities.foreach { case (c, _, _) =>
      if (layoutSrcs.contains(c)) throw new IllegalArgumentException(
        s"$catName.${ident.name}.$c: an IDENTITY column may not drive " +
          "the partition layout — engine-assigned values must not " +
          "choose directories")
    }
    // registration happens LAST inside createTableAt, so the policies
    // land before any other session can resolve the name
    createTableAt(ident, schema, partitions, properties, identities)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTableAt(ident, schema, partitions, properties, Nil)

  /** The one create implementation: the table materializes FULLY
    * (data dir, DEFAULT policies, IDENTITY policies) before the name
    * registers — a failure at any step leaves an UNREGISTERED dir,
    * never a visible table missing half its declared contract, and
    * never a window where another session can write to a table whose
    * policies have not landed yet. */
  private def createTableAt(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String],
                            identities: Seq[(String, Long, Long)]): Table = {
    checkNs(ident.namespace)
    if (nameTaken(ident.name)) throw new TableAlreadyExistsException(ident)
    val path = Option(properties.get(TableCatalog.PROP_LOCATION))
      .getOrElse(new Path(warehouse, ident.name).toString)
    val (plainParts, clusterCols) = GraftCatalog.splitClusterBy(partitions)
    val (explicit, hidden, defaults, bare) =
      GraftCatalog.layoutOf(ident.name, schema, plainParts)
    // validate user TBLPROPERTIES — keys AND column-list values, the
    // schema is in hand (r15 advice: the schema-free check alone still
    // let a bogus graft.bloomCols land a committed-but-unregistered
    // dir) — BEFORE anything materializes; CLUSTER BY lands as the
    // declared-clustering property
    val userProps = GraftCatalog.userTableProps(properties) ++
      clusterCols.map(graft.storage.TxLog.ZorderColsProp -> _)
    if (userProps.nonEmpty)
      TxLog.validateProperties(userProps, Some(bare.fieldNames.toSet))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], bare)
    TxLog.create(empty, path, partitionCols = explicit,
      hiddenPartitions = hidden)
    defaults.foreach { case (c, e) => TxLog.setColumnDefault(spark, path, c, e) }
    (GraftCatalog.identitiesOf(s"$catName.${ident.name}", schema) ++
      identities).foreach { case (c, start, step) =>
        TxLog.setColumnIdentity(spark, path, c, start, step) }
    if (userProps.nonEmpty) TxLog.setProperties(spark, path, userProps)
    registerName(ident.name, path, expectNew = true)
    GraftTable(ident.name, path, None)
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog): the exec writes the
  // SELECT through the staged table's V1Write, then commits or aborts.
  // Atomicity rides what the engine already has: for CREATE the data
  // lands as the table's v1 in ONE TxLog commit and the NAME only
  // registers in commitStagedChanges (an aborted CTAS leaves an
  // unregistered dir that the retry sweeps); for REPLACE the
  // createOrReplace commit is itself atomic and abort RESTOREs the
  // pre-replace version (history kept, Delta's RTAS shape). ----
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    checkNs(ident.namespace)
    if (nameTaken(ident.name)) throw new TableAlreadyExistsException(ident)
    staged(ident, schema, partitions, properties, replacing = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    staged(ident, schema, partitions, properties, replacing = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    checkNs(ident.namespace)
    requireNotView(ident)
    staged(ident, schema, partitions, properties,
      replacing = entries.contains(ident.name))
  }

  /** A CTAS/RTAS must never silently overwrite a VIEW's registry row. */
  private def requireNotView(ident: Identifier): Unit =
    if (viewEntries.contains(ident.name))
      throw new IllegalArgumentException(
        s"$catName.${ident.name} is a VIEW — DROP VIEW it first, or " +
          "CREATE OR REPLACE VIEW to redefine it")

  private def staged(ident: Identifier, schema: StructType,
                     partitions: Array[Transform],
                     properties: util.Map[String, String],
                     replacing: Boolean): StagedGraftTable = {
    val path =
      if (replacing) entries(ident.name)
      else Option(properties.get(TableCatalog.PROP_LOCATION))
        .getOrElse(new Path(warehouse, ident.name).toString)
    val (plainParts, clusterCols) = GraftCatalog.splitClusterBy(partitions)
    val (explicit, hidden, defaults, bare) =
      GraftCatalog.layoutOf(ident.name, schema, plainParts)
    val stagedProps = GraftCatalog.userTableProps(properties) ++
      clusterCols.map(graft.storage.TxLog.ZorderColsProp -> _)
    // same pre-validation as the plain CREATE: a CTAS with a bogus
    // column-list property refuses before the SELECT ever runs
    if (stagedProps.nonEmpty)
      TxLog.validateProperties(stagedProps, Some(bare.fieldNames.toSet))
    new StagedGraftTable(this, ident.name, path, warehouse, bare,
      explicit, hidden, defaults, replacing, stagedProps)
  }

  /** Atomic check-and-register inside the registry lock. A name taken
    * by a DIFFERENT definition always refuses. With `expectNew` (the
    * CREATE flows), a SAME-path entry refuses too: two racing CTAS of
    * one name both stage at the default warehouse path, so "same path"
    * there means the other creator already landed — accepting it would
    * report success for a create whose data a concurrent replace just
    * clobbered. Replace flows keep the idempotent same-path arm. */
  private[tables] def registerName(name: String, path: String,
                                   expectNew: Boolean = false): Unit =
    Catalog.mutateAt(spark, warehouse, m => m.get(name) match {
      case Some(p) if p == path && !expectNew => m
      case Some(_) => throw new TableAlreadyExistsException(
        Identifier.of(Array.empty, name))
      case None => m + (name -> path)
    })

  /** DDL that maps onto the metadata-only ALTER verbs; anything else
    * refuses loudly rather than pretending. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"ALTER TABLE: nested column ${a.fieldNames.mkString(".")} not supported")
        // the catalog declared SUPPORT_COLUMN_DEFAULT_VALUE, so Spark
        // hands DEFAULTs through here — pass them to the engine's
        // policy channel; anything this add cannot honor (a position,
        // a comment, NOT NULL over a metadata-only add that reads
        // existing rows as NULL) refuses loudly rather than silently
        // dropping it (ADVICE r13, medium)
        require(a.position() == null,
          "ALTER TABLE ADD COLUMN: FIRST/AFTER positions are not " +
            "supported — columns append at the end")
        require(a.comment() == null,
          "ALTER TABLE ADD COLUMN: COMMENT is not supported")
        require(a.isNullable,
          "ALTER TABLE ADD COLUMN: NOT NULL is not supported — a " +
            "metadata-only add reads existing rows as NULL")
        TxLog.addColumn(spark, path, a.fieldNames.head, a.dataType.sql,
          default = Option(a.defaultValue()).map(dv =>
            Option(dv.getSql).getOrElse(throw new UnsupportedOperationException(
              s"ALTER TABLE ADD COLUMN: DEFAULT carries no SQL text ($dv)"))))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"ALTER TABLE: nested column ${r.fieldNames.mkString(".")} not supported")
        TxLog.renameColumn(spark, path, r.fieldNames.head, r.newName)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"ALTER TABLE: nested column ${d.fieldNames.mkString(".")} not supported")
        TxLog.dropColumn(spark, path, d.fieldNames.head)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"ALTER TABLE: nested column ${u.fieldNames.mkString(".")} not supported")
        TxLog.alterColumnType(spark, path, u.fieldNames.head, u.newDataType.sql)
      case ac: TableChange.AddConstraint =>
        import org.apache.spark.sql.connector.catalog.constraints.{Check, PrimaryKey, Unique}
        ac.constraint match {
          case c: Check =>
            TxLog.addConstraint(spark, path, c.name, c.predicateSql)
          case u: Unique =>
            TxLog.addUniqueConstraint(spark, path, u.name,
              u.columns.toSeq.map(_.fieldNames.mkString(".")))
          case pk: PrimaryKey =>
            // the engine's UNIQUE gate IS primary-key semantics
            // (non-null keys, write-time collision refusal)
            TxLog.addUniqueConstraint(spark, path, pk.name,
              pk.columns.toSeq.map(_.fieldNames.mkString(".")))
          case other => throw new UnsupportedOperationException(
            s"$catName.${ident.name}: unsupported constraint ${other.toDDL}")
        }
      case dc: TableChange.DropConstraint =>
        val known = TxLog.constraintsOf(spark, path).map(_._1).toSet ++
          TxLog.uniquesOf(spark, path).map(_._1)
        if (known.contains(dc.name)) TxLog.dropConstraint(spark, path, dc.name)
        else if (!dc.ifExists) throw new IllegalArgumentException(
          s"$catName.${ident.name}: no constraint '${dc.name}'")
      case dv: TableChange.UpdateColumnDefaultValue =>
        require(dv.fieldNames.length == 1,
          s"ALTER TABLE: nested column ${dv.fieldNames.mkString(".")} not supported")
        Option(dv.newDefaultValue).map(_.trim).filter(_.nonEmpty) match {
          case Some(e) => TxLog.setColumnDefault(spark, path, dv.fieldNames.head, e)
          case None => TxLog.dropColumnDefault(spark, path, dv.fieldNames.head)
        }
      case s: TableChange.SetProperty =>
        require(!GraftCatalog.ReservedTableProps.contains(s.property),
          s"ALTER TABLE SET TBLPROPERTIES: '${s.property}' is a reserved " +
            "table property — it is derived from the table itself")
        TxLog.setProperties(spark, path, Map(s.property -> s.value))
      case r: TableChange.RemoveProperty =>
        require(!GraftCatalog.ReservedTableProps.contains(r.property),
          s"ALTER TABLE UNSET TBLPROPERTIES: '${r.property}' is a reserved " +
            "table property — it is derived from the table itself")
        TxLog.unsetProperties(spark, path, Seq(r.property))
      case other => throw new UnsupportedOperationException(
        s"$catName.${ident.name}: unsupported ALTER ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  /** Drops the NAME; the table dir is untouched (a registry must never
    * be the thing that deletes data — vacuum/rm it separately). */
  override def dropTable(ident: Identifier): Boolean = {
    val existed = tableExists(ident)
    if (existed) Catalog.mutateAt(spark, warehouse, _ - ident.name)
    existed
  }

  override def renameTable(old: Identifier, to: Identifier): Unit = {
    val path = pathOf(old)
    checkNs(to.namespace)
    if (nameTaken(to.name)) throw new TableAlreadyExistsException(to)
    Catalog.mutateAt(spark, warehouse, m => m - old.name + (to.name -> path))
  }

  // ---- persistent views (ViewCatalog): CREATE VIEW graft.v AS ... —
  // the reference's own `CREATE VIEW` shape
  // (R/postgres_process.Rmd:137, `ukbb_gwas_results_export`). The SQL
  // text persists in the SAME registry file as table names under a
  // `view:` value tag, so a fresh session resolves the view, and the
  // body re-analyzes against the CURRENT head of its tables — reads
  // through a view plan onto the V1 mount with full pushdown, exactly
  // like the table read it wraps. ----

  override def listViews(namespace: String*): Array[Identifier] = {
    checkNs(namespace.toArray)
    viewEntries.keys.toSeq.sorted
      .map(Identifier.of(namespace.toArray, _)).toArray
  }

  override def viewExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      viewEntries.contains(ident.name)

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View = {
    checkNs(ident.namespace)
    GraftView(ident.name, viewEntries.getOrElse(ident.name,
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)))
  }

  override def createView(info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    checkNs(info.ident.namespace)
    val payload = GraftView.encode(info)
    // existence checks run INSIDE the registry mutation (atomic
    // check-and-insert) — a racing CREATE TABLE/VIEW of the same name
    // must lose loudly, not overwrite
    Catalog.mutateAt(spark, warehouse, { m =>
      m.get(info.ident.name) match {
        case Some(v) if v.startsWith(GraftCatalog.ViewTag) =>
          throw new org.apache.spark.sql.catalyst.analysis
            .ViewAlreadyExistsException(info.ident)
        case Some(_) => throw new TableAlreadyExistsException(info.ident)
        case None => m + (info.ident.name -> (GraftCatalog.ViewTag + payload))
      }
    })
    GraftView(info.ident.name, payload)
  }

  override def replaceView(info: org.apache.spark.sql.connector.catalog.ViewInfo,
                           orCreate: Boolean)
      : org.apache.spark.sql.connector.catalog.View = {
    checkNs(info.ident.namespace)
    val payload = GraftView.encode(info)
    Catalog.mutateAt(spark, warehouse, { m =>
      m.get(info.ident.name) match {
        case Some(v) if !v.startsWith(GraftCatalog.ViewTag) =>
          throw new TableAlreadyExistsException(info.ident)
        case None if !orCreate =>
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchViewException(info.ident)
        case _ => m + (info.ident.name -> (GraftCatalog.ViewTag + payload))
      }
    })
    GraftView(info.ident.name, payload)
  }

  override def dropView(ident: Identifier): Boolean = {
    val existed = viewExists(ident)
    if (existed) Catalog.mutateAt(spark, warehouse, _ - ident.name)
    existed
  }

  override def renameView(old: Identifier, to: Identifier): Unit = {
    checkNs(to.namespace)
    Catalog.mutateAt(spark, warehouse, { m =>
      val payload = m.get(old.name)
        .filter(_.startsWith(GraftCatalog.ViewTag))
        .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchViewException(old))
      if (m.contains(to.name))
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(to)
      m - old.name + (to.name -> payload)
    })
  }

  override def alterView(ident: Identifier,
                         changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View =
    throw new UnsupportedOperationException(
      s"$catName.${ident.name}: ALTER VIEW properties are not supported — " +
        "CREATE OR REPLACE VIEW with the new definition")
}

object GraftCatalog {
  /** Registry value tag marking a VIEW row (everything else is a
    * table path). */
  private[tables] val ViewTag = "view:"

  /** Properties DERIVED from the table itself — never persisted, and
    * refused through SET/UNSET TBLPROPERTIES. `comment` deliberately
    * stays settable (COMMENT ON TABLE rides the property channel). */
  private[tables] val ReservedTableProps: Set[String] =
    Set("location", "provider", "owner", "external", "path",
      "is_managed_location", "versionAsOf")

  /** TBLPROPERTIES the engine persists: everything a CREATE hands
    * over minus the reserved/engine-derived entries and write options
    * (`option.*`). */
  /** V2 `sources.Filter` → Column, for the REPLACE WHERE overwrite
    * path. Unsupported shapes refuse loudly — a silently-dropped
    * filter would widen the replaced region. */
  private[tables] def filterToColumn(table: String, f: Filter)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(c, v) => col(c) === lit(v)
      case EqualNullSafe(c, v) => col(c) <=> lit(v)
      case GreaterThan(c, v) => col(c) > lit(v)
      case GreaterThanOrEqual(c, v) => col(c) >= lit(v)
      case LessThan(c, v) => col(c) < lit(v)
      case LessThanOrEqual(c, v) => col(c) <= lit(v)
      case In(c, vs) => col(c).isin(vs.toIndexedSeq: _*)
      case IsNull(c) => col(c).isNull
      case IsNotNull(c) => col(c).isNotNull
      case StringStartsWith(c, v) => col(c).startsWith(v)
      case StringEndsWith(c, v) => col(c).endsWith(v)
      case StringContains(c, v) => col(c).contains(v)
      case And(l, r) => filterToColumn(table, l) && filterToColumn(table, r)
      case Or(l, r) => filterToColumn(table, l) || filterToColumn(table, r)
      case Not(c) => !filterToColumn(table, c)
      case _: AlwaysTrue => lit(true)
      case _: AlwaysFalse => lit(false)
      case other => throw new UnsupportedOperationException(
        s"graft.$table: REPLACE WHERE cannot translate filter $other — " +
          "spell the overwrite through TxLog.replaceWhere")
    }
  }

  private[tables] def userTableProps(
      properties: java.util.Map[String, String]): Map[String, String] =
    scala.jdk.CollectionConverters.MapHasAsScala(properties).asScala.toMap
      .filterNot { case (k, _) =>
        ReservedTableProps.contains(k) || k.startsWith("option.") }

  /** Split a CREATE's schema + transforms into the engine's layout:
    * explicit partition columns, hidden transform specs, DEFAULT
    * policies (from CURRENT_DEFAULT field metadata), and the
    * metadata-stripped schema. */
  /** `CREATE TABLE ... CLUSTER BY (a, b)` (Spark's ClusterByTransform)
    * maps onto the DECLARED clustering property — liquid clustering's
    * DDL spelling over the `graft.zorderCols` machinery a bare
    * OPTIMIZE already reads. Returns the remaining transforms and the
    * clustering CSV (if declared); clustering composes with identity
    * partitioning but is its own axis, not a partition layout. */
  private[tables] def splitClusterBy(partitions: Array[Transform])
      : (Array[Transform], Option[String]) = {
    import org.apache.spark.sql.connector.expressions.ClusterByTransform
    val (cluster, rest) =
      partitions.partition(_.isInstanceOf[ClusterByTransform])
    val cols = cluster.collectFirst {
      case t: ClusterByTransform =>
        t.columnNames.map(_.fieldNames().mkString(".")).mkString(",")
    }
    (rest, cols)
  }

  private[tables] def layoutOf(name: String, schema: StructType,
                               partitions: Array[Transform])
      : (Seq[String], Seq[String], Seq[(String, String)], StructType) = {
    val specs = partitions.toSeq.map(specOf)
    val explicit = specs.collect { case Left(c) => c }
    val hidden = specs.collect { case Right(sp) => sp }
    require(explicit.isEmpty || hidden.isEmpty,
      s"$name: identity partition columns and hidden transforms are " +
        "mutually exclusive (a hidden layout derives its dirs)")
    val defaults = schema.fields.toSeq.flatMap(f =>
      if (f.metadata.contains("CURRENT_DEFAULT") &&
          !f.metadata.contains("identity.start"))
        Some(f.name -> f.metadata.getString("CURRENT_DEFAULT"))
      else None)
    val bare = StructType(schema.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    (explicit, hidden, defaults, bare)
  }

  /** `GENERATED ALWAYS AS IDENTITY` columns in a CREATE TABLE schema:
    * (column, start, step). Spark hands the spec as the field-metadata
    * keys `identity.start/step/allowExplicitInsert`; GENERATED BY
    * DEFAULT (explicit inserts allowed) refuses loudly — the engine
    * implements the ALWAYS contract only. */
  private[tables] def identitiesOf(name: String, schema: StructType)
      : Seq[(String, Long, Long)] =
    schema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains("identity.start")) None
      else {
        if (f.metadata.contains("identity.allowExplicitInsert") &&
            f.metadata.getBoolean("identity.allowExplicitInsert"))
          throw new UnsupportedOperationException(
            s"$name.${f.name}: GENERATED BY DEFAULT AS IDENTITY is not " +
              "supported — use GENERATED ALWAYS AS IDENTITY")
        Some((f.name, f.metadata.getLong("identity.start"),
          f.metadata.getLong("identity.step")))
      }
    }

  /** V2 transform → graft layout: identity → explicit partition
    * column (Left), everything else → a hidden-partition spec string
    * (Right) in [[graft.storage.PartitionTransforms]]' grammar. */
  private[tables] def specOf(t: Transform): Either[String, String] = {
    def col: String = {
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"unsupported partition transform $t (need one top-level column)")
      refs.head.fieldNames.head
    }
    def intArg: String = t.arguments().collectFirst {
      case l: VLiteral[_] => String.valueOf(l.value)
    }.getOrElse(throw new IllegalArgumentException(
      s"partition transform $t: missing literal argument"))
    t.name match {
      case "identity" => Left(col)
      case "days" => Right(s"days($col)")
      case "hours" => Right(s"hours($col)")
      case "bucket" => Right(s"bucket($intArg, $col)")
      case "truncate" => Right(s"truncate($intArg, $col)")
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform '$other' — supported: identity " +
          "columns, days(c), hours(c), bucket(n, c), truncate(n, c)")
    }
  }
}

/** A named TxLog snapshot as a V2 `Table`. Reads never go through a
  * V2 scan: [[GraftAnalysis]] rewrites the relation onto
  * [[GraftTable.v1Relation]] (the same `HadoopFsRelation` mount every
  * other entry point uses — that is what buys stock vectorized
  * parquet, codegen, and pushdown). Writes go through Spark's V1
  * write fallback into the transactional verbs. */
case class GraftTable(tableName: String, path: String,
                      versionAsOf: Option[Long])
  extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  private def spark: SparkSession = SparkSession.active

  /** TRUNCATE TABLE graft.t — empty the table in ONE commit, history
    * kept, and (like INSERT OVERWRITE) the governance contract
    * carries: constraints, policies and IDENTITY marks survive, so the
    * next insert still vets and still allocates. */
  override def truncateTable(): Boolean = {
    require(versionAsOf.isEmpty,
      s"graft.$tableName: cannot truncate a time-travel snapshot")
    val declared = StructType.fromDDL(manifest.schemaDdl)
    // keepPolicies derives layout/stats/schema from the table's own
    // definition — no layout arguments to mis-encode
    TxLog.createOrReplace(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], declared),
      path, keepPolicies = true)
    true
  }

  /** The V1 mount this table serves reads through — built by the SAME
    * provider as `spark.read.format("graft-txlog")`, so schema shape
    * (partition columns last on explicit layouts) and the DV-budget
    * fallback are identical by construction. */
  lazy val v1Relation: BaseRelation =
    new graft.sources.TxLogStream().createRelation(spark.sqlContext,
      Map("path" -> path) ++ versionAsOf.map("versionAsOf" -> _.toString))

  private lazy val manifest: TxLog.Manifest = {
    val v = versionAsOf.orElse(TxLog.currentVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"TxLog: no table at $path"))
    TxLog.manifest(spark, path, v)
  }

  override def name(): String = tableName
  /** DECLARED column order (what CREATE TABLE said), not the mount's
    * physical arrangement (partition columns last) — positional
    * INSERT ... VALUES and SELECT * follow this; [[GraftAnalysis]]
    * projects the mount back into it. Column DEFAULTs surface as
    * CURRENT_DEFAULT field metadata, so Spark's own default-column
    * resolution fills them in INSERTs with explicit column lists. */
  override def schema(): StructType = {
    val m = manifest
    val defs = TxLog.columnDefaults(m)
    val ids = TxLog.identityColumns(m)
    StructType(StructType.fromDDL(m.schemaDdl).fields.map { f =>
      // IDENTITY columns surface their spec (DESCRIBE/SHOW CREATE
      // fidelity); an INSERT that OMITS the column resolves through
      // Spark's identity handling and lands NULLs the engine's fill
      // treats as omitted — explicit non-null values refuse in the verb
      ids.get(f.name).map { case (step, next) => f.copy(metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("identity.start", next)
          .putLong("identity.step", step)
          .putBoolean("identity.allowExplicitInsert", false).build())
      }.orElse(defs.get(f.name).map(e => f.copy(metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("CURRENT_DEFAULT", e)
          .putString("EXISTS_DEFAULT", "NULL").build()))).getOrElse(f)
    })
  }
  /** AUTOMATIC_SCHEMA_EVOLUTION opts into Spark's own
    * `MERGE ... WITH SCHEMA EVOLUTION` analysis: the analyzer computes
    * the AddColumn set from the source schema, ALTERs through
    * [[GraftCatalog.alterTable]] (one widening commit), reloads this
    * table and re-resolves the merge against the widened schema —
    * [[GraftAnalysis]] then lowers the merge itself onto
    * [[TxLog.mergeWhen]] with `evolveSchema = true` so a source that
    * somehow still carries extra columns widens in the merge commit. */
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val m = manifest
    if (m.partitionSpec.nonEmpty)
      graft.storage.PartitionTransforms
        .parseAll(m.partitionSpec, StructType.fromDDL(m.schemaDdl)).map {
          case b: graft.storage.PartitionTransforms.Bucket =>
            Expressions.bucket(b.n, b.src)
          case t => Expressions.apply(t.spec.takeWhile(_ != '('),
            t.spec.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
              .split(",").map(_.trim).filter(_.nonEmpty)
              .map(a => a.toIntOption.map(Expressions.literal[Integer](_))
                .getOrElse(Expressions.column(a))): _*)
        }.toArray
    else m.partitionCols.map(Expressions.identity).toArray
  }

  /** The enforced constraint set, surfaced through Spark's own
    * DESCRIBE machinery: user CHECKs verbatim, UNIQUEs as primary-key
    * constraints (that is the gate's semantics — non-null keys,
    * write-time collision refusal). Reserved policy entries
    * (DEFAULT/GENERATED) surface as column metadata, not here. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    import org.apache.spark.sql.connector.expressions.Expressions
    val m = manifest
    val checks = m.constraints.filterNot(_._1.startsWith("__")).map {
      case (n, e) => Constraint.check(n).predicateSql(e)
        .enforced(true).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }
    val uniques = m.uniques.map { case (n, cols) =>
      Constraint.primaryKey(n,
        cols.map(c => Expressions.column(c)
          : org.apache.spark.sql.connector.expressions.NamedReference).toArray)
        .enforced(true).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }
    (checks ++ uniques).toArray
  }

  override def properties(): util.Map[String, String] =
    // persisted TBLPROPERTIES first — the derived entries always win
    (TxLog.propsOf(manifest) ++
      Map("location" -> path, "provider" -> "graft-txlog") ++
      versionAsOf.map("versionAsOf" -> _.toString)).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwrite {
      require(versionAsOf.isEmpty,
        s"graft.$tableName: cannot write to a time-travel snapshot")
      // None = append; Some(Nil) = truncate-overwrite;
      // Some(filters) = static-partition overwrite
      private var overwriteFilters: Option[Seq[Filter]] = None

      override def truncate(): WriteBuilder = { overwriteFilters = Some(Nil); this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        if (filters.forall(_.isInstanceOf[AlwaysTrue])) truncate()
        else { overwriteFilters = Some(filters.toSeq); this }
      }

      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val m = manifest
              // the V1 exec hands rows in the RELATION's column order
              // (partition columns last); the verbs expect declared
              // order
              val declared = StructType.fromDDL(m.schemaDdl)
              val aligned = data.select(declared.fieldNames.map(
                org.apache.spark.sql.functions.col).toIndexedSeq: _*)
              overwriteFilters match {
                case None => TxLog.append(aligned, path)
                case Some(Nil) =>
                  // INSERT OVERWRITE: truncate + insert in ONE commit —
                  // layout/stats/schema kept (derived from the table's
                  // own definition inside keepPolicies), history kept,
                  // and constraints/policies/identity marks CARRY and
                  // vet the incoming rows (an overwrite is a data op,
                  // not a redefinition — shedding the contract silently
                  // would let the next insert write NULL surrogate ids)
                  TxLog.createOrReplace(aligned, path, keepPolicies = true)
                case Some(filters) =>
                  // INSERT OVERWRITE ... PARTITION (p = v, ...) when
                  // every partition column is pinned: the atomic
                  // partition-replacement verb. ANY other filter set —
                  // Spark's own `INSERT INTO t REPLACE WHERE <cond>`
                  // lowers to OverwriteByExpression and lands here —
                  // routes to the predicate-scoped replaceWhere
                  // (Delta's semantics: file-granular, incoming rows
                  // vetted inside the region).
                  val pcs = m.partitionCols
                  val static = filters.flatMap {
                    case EqualTo(c, v) if pcs.contains(c) => Some(c -> v)
                    case org.apache.spark.sql.sources.EqualNullSafe(c, v)
                      if pcs.contains(c) => Some(c -> v)
                    case _ => None
                  }.toMap
                  if (static.size == filters.size &&
                      static.keySet == pcs.toSet) {
                    val tuple =
                      if (pcs.size == 1) static(pcs.head)
                      else pcs.map(static)
                    TxLog.replacePartitions(aligned, path, Seq(tuple))
                  } else
                    TxLog.replaceWhere(aligned, path,
                      filters.map(GraftCatalog.filterToColumn(tableName, _))
                        .reduce(_ && _))
              }
              ()
            }
          }
      }
    }

  override def toString: String =
    s"GraftTable($tableName at $path${versionAsOf.fold("")("@v" + _)})"
}

/** A staged CTAS/RTAS target (see [[GraftCatalog.stageCreate]]).
  * The exec's write lands through [[V1Write]]: for CREATE the data IS
  * the table's first commit (no empty-then-append two-step), for
  * REPLACE it is one atomic createOrReplace commit (history kept).
  * `commitStagedChanges` applies DEFAULT policies and registers the
  * name; `abortStagedChanges` deletes a never-registered create dir,
  * or restores a replaced table to its pre-replace version. */
class StagedGraftTable(cat: GraftCatalog, tableName: String, path: String,
                       warehouse: String, bare: StructType,
                       explicit: Seq[String], hidden: Seq[String],
                       defaults: Seq[(String, String)], replacing: Boolean,
                       userProps: Map[String, String] = Map.empty)
  extends org.apache.spark.sql.connector.catalog.StagedTable
    with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  // the pre-stage state decides what abort may touch: a REPLACE (or a
  // create over a path that already held table versions) rolls back to
  // this version; a create into a PRE-EXISTING directory must never
  // recursively delete it (an explicit LOCATION can point at an
  // unregistered graft table or other data this CTAS did not create —
  // ADVICE r13, medium); only a directory this CTAS itself created is
  // safe to sweep on abort.
  private val preVersion: Option[Long] = TxLog.currentVersion(spark, path)
  private val preExistingDir: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
  @volatile private var written = false

  override def name(): String = tableName
  override def schema(): StructType = bare
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      // REPLACE TABLE AS SELECT arrives as a truncate-write into the
      // staged target; insert() below redefines whole either way
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val aligned = data.select(bare.fieldNames.map(
                org.apache.spark.sql.functions.col).toIndexedSeq: _*)
              if (replacing || TxLog.currentVersion(spark, path).isDefined)
                // REPLACE — or a crashed, never-registered create left
                // an invisible dir at this path: redefine it whole
                TxLog.createOrReplace(aligned, path,
                  partitionCols = explicit, hiddenPartitions = hidden)
              else
                TxLog.create(aligned, path,
                  partitionCols = explicit, hiddenPartitions = hidden)
              written = true
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    if (!written) {
      // CREATE TABLE routed through staging without a query: land the
      // empty definition (parity with the non-staged createTable)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bare)
      if (replacing || TxLog.currentVersion(spark, path).isDefined)
        TxLog.createOrReplace(empty, path,
          partitionCols = explicit, hiddenPartitions = hidden)
      else TxLog.create(empty, path,
        partitionCols = explicit, hiddenPartitions = hidden)
    }
    defaults.foreach { case (c, e) =>
      TxLog.setColumnDefault(spark, path, c, e) }
    // a REPLACE reset the property set (redefinition semantics) —
    // the staged TBLPROPERTIES land fresh either way
    if (userProps.nonEmpty) TxLog.setProperties(spark, path, userProps)
    // a plain CREATE must lose a registration race loudly — the other
    // creator's committed data is live under this very path; REPLACE
    // flows re-land the same name → path idempotently
    cat.registerName(tableName, path, expectNew = !replacing)
  }

  override def abortStagedChanges(): Unit =
    if (preVersion.isDefined) {
      // the commit may already have landed (REPLACE, or a create whose
      // path already held table versions — insert() createOrReplace'd
      // it): roll back to the pre-stage version (a ref commit, O(1));
      // history is kept, nothing this CTAS did not create is deleted
      preVersion.foreach { pv =>
        if (TxLog.currentVersion(spark, path).exists(_ > pv))
          TxLog.restore(spark, path, pv)
      }
    } else if (!preExistingDir) {
      // a directory THIS create made, never registered: invisible
      // garbage — sweep it
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      ()
    }
    // else: the path pre-existed without table versions (an explicit
    // LOCATION over foreign data) — leave it untouched; the staged
    // files are unregistered and invisible

  override def toString: String = s"StagedGraftTable($tableName at $path)"
}

/** A persistent view row decoded from the registry: the stored SQL
  * text plus the analysis context Spark re-resolves it under (catalog,
  * namespace, declared schema, column names/aliases). The body
  * re-analyzes per read, so pushdown and pruning plan against the
  * CURRENT head of the underlying tables. */
case class GraftView(viewName: String, payload: String)
  extends org.apache.spark.sql.connector.catalog.View {
  private val node =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(payload)
  private def arr(field: String): Array[String] = {
    val n = node.get(field)
    if (n == null || n.isNull) Array.empty
    else (0 until n.size()).map(n.get(_).asText()).toArray
  }
  override def name(): String = viewName
  override def query(): String = node.get("sql").asText()
  override def currentCatalog(): String = node.get("catalog").asText()
  override def currentNamespace(): Array[String] = arr("namespace")
  override def schema(): StructType =
    StructType.fromDDL(node.get("schema").asText())
  override def queryColumnNames(): Array[String] = arr("queryColumnNames")
  override def columnAliases(): Array[String] = arr("columnAliases")
  override def columnComments(): Array[String] =
    columnAliases().map(_ => null)
  override def properties(): util.Map[String, String] =
    java.util.Collections.emptyMap()
}

object GraftView {
  /** ViewInfo → the registry JSON payload. */
  private[tables] def encode(
      info: org.apache.spark.sql.connector.catalog.ViewInfo): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.createObjectNode()
    n.put("sql", info.sql())
    n.put("catalog", info.currentCatalog())
    n.put("schema", info.schema().toDDL)
    def putArr(field: String, vals: Array[String]): Unit = {
      val a = n.putArray(field)
      Option(vals).getOrElse(Array.empty[String]).foreach(a.add)
    }
    putArr("namespace", info.currentNamespace())
    putArr("queryColumnNames", info.queryColumnNames())
    putArr("columnAliases", info.columnAliases())
    mapper.writeValueAsString(n)
  }
}
