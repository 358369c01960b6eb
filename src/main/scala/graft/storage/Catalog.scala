package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal NAMED-TABLE catalog over TxLog paths — the glue that
  * turns a directory full of table dirs into something a SQL user can
  * address by name:
  *
  *   spark.conf.set("graft.catalog.warehouse", "/data/lake")
  *   Catalog.create(spark, "events", df, hiddenPartitions = Seq("days(ts)"))
  *   Catalog.table(spark, "events")            // DataFrame, full pushdown
  *   Catalog.attach(spark)                     // SQL: SELECT * FROM events
  *   TXLOG APPEND INTO 'events' ...            // verbs accept names too
  *
  * The registry is ONE json file (`<warehouse>/_catalog.json`,
  * name → table path) rewritten atomically (temp + rename under a
  * per-warehouse JVM lock — the same durability class as TxLog's
  * commit files; concurrent writers from SEPARATE processes are
  * last-writer-wins on the REGISTRY, never on table data, which TxLog
  * itself serializes). This object is the Scala-API face and the
  * registry OWNER; the same file also backs the Spark V2
  * `TableCatalog` ([[graft.tables.GraftCatalog]] — `SELECT * FROM
  * graft.t`, INSERT/UPDATE/DELETE/MERGE through Spark's own resolver,
  * reads lowered onto the V1 `HadoopFsRelation` mount by
  * [[graft.tables.GraftAnalysis]]), so both surfaces share one
  * namespace. [[attach]] additionally bridges names into the SESSION
  * catalog (`CREATE TABLE name USING graft-txlog`) for tools that
  * only see unqualified names. */
object Catalog {

  private val NameRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def warehouse(spark: SparkSession): String =
    spark.conf.getOption("graft.catalog.warehouse").getOrElse(
      throw new IllegalStateException(
        "graft.catalog.warehouse is not set — point it at the directory " +
          "that holds (or will hold) the lake's table dirs"))

  private def catPath(w: String) = new Path(w, "_catalog.json")
  private def fs(spark: SparkSession, w: String) =
    catPath(w).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // freshness-keyed parse cache: analysis reads the registry once per
  // graft-named relation per resolver pass (the view rule especially),
  // and on an object store each read is an RPC + GET. Keying the
  // parsed map on (mtime, length) turns that into ONE status probe per
  // read, never a TTL guess. Honest scope: SAME-JVM freshness is exact
  // (mutateAt refreshes the cache under the registry lock); a
  // DIFFERENT process observing a same-length rewrite within one mtime
  // tick could read stale — a narrower instance of the registry's
  // documented cross-process model (last-writer-wins, no cross-process
  // lock), not a new coherence class.
  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Map[String, String])]()

  private def readAll(spark: SparkSession, w: String): Map[String, String] = {
    val f = fs(spark, w)
    val p = catPath(w)
    val st =
      try Some(f.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => Map.empty
      case Some(s) =>
        val cached = Option(parseCache.get(w))
        cached match {
          case Some((mt, len, m))
              if mt == s.getModificationTime && len == s.getLen => m
          case _ =>
            val in = f.open(p)
            val bytes = try in.readAllBytes() finally in.close()
            val node = new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(bytes)
            val it = node.fieldNames()
            val m = Iterator.continually(if (it.hasNext) it.next() else null)
              .takeWhile(_ != null).map(n => n -> node.get(n).asText()).toMap
            parseCache.put(w, (s.getModificationTime, s.getLen, m))
            m
        }
    }
  }

  private def writeAll(spark: SparkSession, w: String,
                       entries: Map[String, String]): Unit = {
    val f = fs(spark, w)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    entries.toSeq.sortBy(_._1).foreach { case (n, p) => node.put(n, p) }
    f.mkdirs(new Path(w))
    val tmp = new Path(w, s"._catalog.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
    // POSIX rename overwrites — exactly what a registry update wants
    f.delete(catPath(w), false)
    require(f.rename(tmp, catPath(w)), s"Catalog: rename failed at $w")
  }

  private def mutate(spark: SparkSession,
                     f: Map[String, String] => Map[String, String]): Unit =
    mutateAt(spark, warehouse(spark), f)

  /** Registry primitives against an EXPLICIT warehouse — the seam the
    * V2 [[graft.tables.GraftCatalog]] shares, so `spark.sql` names and
    * the Scala-API names resolve through one file. */
  private[graft] def entriesAt(spark: SparkSession, w: String): Map[String, String] =
    readAll(spark, w)

  private[graft] def mutateAt(spark: SparkSession, w: String,
                              f: Map[String, String] => Map[String, String]): Unit = {
    val lock = locks.computeIfAbsent(w, _ => new Object)
    lock.synchronized {
      val next = f(readAll(spark, w))
      writeAll(spark, w, next)
      // refresh the parse cache under the lock: an mtime tick coarser
      // than two same-length rewrites (rename a→b of equal-length
      // names) could otherwise serve the pre-write map to this JVM
      try {
        val s = fs(spark, w).getFileStatus(catPath(w))
        parseCache.put(w, (s.getModificationTime, s.getLen, next))
      } catch { case _: java.io.IOException => parseCache.remove(w) }
      ()
    }
  }

  /** Register an EXISTING table dir under a name. */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    require(NameRe.findFirstIn(name).isDefined,
      s"Catalog: invalid table name '$name' (want [A-Za-z_][A-Za-z0-9_]*)")
    require(TxLog.currentVersion(spark, path).isDefined,
      s"Catalog: no TxLog table at $path — create it first")
    mutate(spark, m => m + (name -> path))
  }

  /** Create a table AT `<warehouse>/<name>` and register it. */
  def create(spark: SparkSession, name: String, df: DataFrame,
             partitionCol: Option[String] = None,
             statsCols: Seq[String] = Nil,
             partitionCols: Seq[String] = Nil,
             hiddenPartitions: Seq[String] = Nil): String = {
    require(NameRe.findFirstIn(name).isDefined,
      s"Catalog: invalid table name '$name' (want [A-Za-z_][A-Za-z0-9_]*)")
    val path = new Path(warehouse(spark), name).toString
    TxLog.create(df, path, partitionCol, statsCols, partitionCols,
      hiddenPartitions)
    mutate(spark, m => m + (name -> path))
    path
  }

  /** Registry rows whose value is a TABLE path (VIEW rows carry the
    * `view:` tag and belong to the V2 catalog's ViewCatalog face). */
  private def tableRows(all: Map[String, String]): Map[String, String] =
    all.filterNot(_._2.startsWith("view:"))

  /** Name → table path; loud on unknown names, listing what exists. */
  def resolve(spark: SparkSession, name: String): String = {
    val all = readAll(spark, warehouse(spark))
    if (all.get(name).exists(_.startsWith("view:")))
      throw new IllegalArgumentException(
        s"Catalog: '$name' is a VIEW — query it through SQL " +
          s"(SELECT ... FROM graft.$name); the verbs take table names")
    tableRows(all).getOrElse(name, throw new IllegalArgumentException(
      s"Catalog: no table '$name' — known: " +
        tableRows(all).keys.toSeq.sorted.mkString(", ")))
  }

  /** Drop the NAME (the table dir is untouched — vacuum/delete it
    * separately; a registry must never be the thing that deletes
    * data). */
  def drop(spark: SparkSession, name: String): Unit =
    mutate(spark, m => m - name)

  /** Mount a named table — same relation as
    * `spark.read.format("graft-txlog")`, full pushdown. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.read.format("graft-txlog")
      .option("path", resolve(spark, name)).load()

  /** One row per registered table: name, path, head version, files,
    * metadata-only row count. */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tableRows(readAll(spark, warehouse(spark))).toSeq.sortBy(_._1).map { case (n, p) =>
      val v = TxLog.currentVersion(spark, p)
      val m = v.map(TxLog.manifest(spark, p, _))
      (n, p, v.getOrElse(-1L), m.map(_.files.size.toLong).getOrElse(0L),
        v.flatMap(_ => TxLog.fastCount(spark, p)).getOrElse(-1L))
    }.toDF("name", "path", "version", "num_files", "rows")
  }

  /** Register every cataloged name in the SESSION catalog so plain
    * `spark.sql("SELECT ... FROM name")` works (the V1-source bridge:
    * `CREATE TABLE name USING graft-txlog`). Idempotent; names already
    * taken by a different definition refuse loudly rather than
    * shadowing. */
  def attach(spark: SparkSession): Unit =
    tableRows(readAll(spark, warehouse(spark))).toSeq.sortBy(_._1).foreach {
      case (n, p) =>
        if (!spark.catalog.tableExists(n))
          spark.sql(s"CREATE TABLE $n USING `graft-txlog` " +
            s"OPTIONS (path '${p.replace("'", "''")}')")
    }

  /** Is this TXLOG-verb target a catalog NAME (no separators) rather
    * than a filesystem path? */
  private[graft] def isName(target: String): Boolean =
    NameRe.findFirstIn(target).isDefined

  /** Resolve a verb target: bare names go through the catalog (when a
    * warehouse is configured), anything path-shaped passes through. */
  private[graft] def resolveTarget(spark: SparkSession, target: String): String =
    if (isName(target) && spark.conf.getOption("graft.catalog.warehouse").isDefined)
      resolve(spark, target)
    else target
}
