package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE-time column statistics for cost-based optimization — the
  * piece the reference gets for free from Postgres ANALYZE
  * (create_db.sh loads into Postgres; the planner reads pg_statistic)
  * and a bare parquet lake lacks: table-level NDV per column.
  *
  * The manifest already carries exact per-file min/max/nullCount and
  * row counts, so sizeInBytes and rowCount are always live; what a
  * 3+-table join plans its FIRST shuffle on — before AQE has seen a
  * row — is column distinct counts for join reordering. ANALYZE
  * computes them as Apache DataSketches HLL sketches (Spark's
  * `hll_sketch_agg`, one aggregation pass, map-side combinable) and
  * persists sketch + estimate per column in `_stats/ndv.json`
  * (atomic temp+rename, [[graft.operators.ArtifactLock]]-serialized
  * like the other rebuildable sidecar artifacts).
  *
  * MERGEABILITY is the point of keeping the sketches: a re-ANALYZE of
  * an append-only table reads ONLY the files added since the last
  * run ([[TxLog.appendsSince]]) and hll_unions the new slice into the
  * stored sketches — O(new data), the OPTIMIZE-time refresh shape.
  * History with removes/rewrites falls back to a full recompute
  * (sketches cannot unmerge; NDV would otherwise over-count).
  *
  * Staleness contract: NDV is an ESTIMATE for the planner, never a
  * correctness input. Between ANALYZE runs an appended table's true
  * NDV can only grow, so the stored value is a lower bound — the
  * planner still reorders sanely; [[graft_table_health]] surfaces the
  * analyzed-at version so operators see drift. */
object Analyze {

  final case class ColNdv(ndv: Long, sketchB64: String)
  final case class TableNdv(analyzedVersion: Long, cols: Map[String, ColNdv])

  private def statsDir(path: String) = new Path(path, "_stats")
  private def ndvPath(path: String) = new Path(statsDir(path), "ndv.json")

  /** Columns hll_sketch_agg accepts directly; everything else
    * sketches its canonical string form (distinctness-preserving). */
  private def sketchCol(f: org.apache.spark.sql.types.StructField)
      : Option[org.apache.spark.sql.Column] = f.dataType match {
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.BinaryType => Some(col(s"`${f.name}`"))
    case org.apache.spark.sql.types.VariantType => None // no value order
    case _: org.apache.spark.sql.types.MapType => None
    case _: org.apache.spark.sql.types.ArrayType => None
    case _: org.apache.spark.sql.types.StructType => None
    case _ => Some(col(s"`${f.name}`").cast("string"))
  }

  private def sketchAgg(df: DataFrame, names: Seq[String])
      : Map[String, Array[Byte]] = {
    val schema = df.schema
    val aggs = names.flatMap { n =>
      sketchCol(schema(n)).map(c => hll_sketch_agg(c).as(n))
    }
    if (aggs.isEmpty) return Map.empty
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    names.filter(n => sketchCol(schema(n)).isDefined).zipWithIndex.map {
      case (n, i) => n -> (if (row.isNullAt(i)) Array.empty[Byte]
                           else row.getAs[Array[Byte]](i))
    }.toMap
  }

  private def estimate(spark: SparkSession,
                       sketches: Map[String, Array[Byte]])
      : Map[String, ColNdv] = {
    if (sketches.isEmpty) return Map.empty
    import spark.implicits._
    val names = sketches.keys.toSeq.sorted
    val est = names.map(n => sketches(n)).toDF("s")
      .select(when(length(col("s")) > 0,
        hll_sketch_estimate(col("s"))).as("e"))
      .collect().map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
    names.zip(est).map { case (n, e) =>
      n -> ColNdv(e, java.util.Base64.getEncoder.encodeToString(sketches(n)))
    }.toMap
  }

  /** Full or incremental ANALYZE of the table head. Returns the
    * persisted stats. `cols` defaults to every sketchable top-level
    * column. */
  def analyze(spark: SparkSession, path: String,
              cols: Seq[String] = Nil): TableNdv =
    graft.operators.ArtifactLock.withLock(spark, statsDir(path).toString,
      "analyze") {
      val v = TxLog.currentVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"TxLog: no table at $path"))
      val m = TxLog.manifest(spark, path, v)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
      val wanted =
        if (cols.nonEmpty) {
          cols.foreach(c => require(schema.fieldNames.contains(c),
            s"TxLog.analyze: column '$c' is not in the schema"))
          cols
        } else schema.fields.filter(sketchCol(_).isDefined).map(_.name).toSeq
      val prior = read(spark, path)
      // short-circuit: every wanted column already analyzed at this
      // exact version — nothing can have changed, return the stored
      // stats without a recompute or a rewrite
      prior match {
        case Some(p) if p.analyzedVersion == v &&
            wanted.forall(p.cols.contains) => p
        case _ =>
          val sketchable =
            schema.fields.filter(sketchCol(_).isDefined).map(_.name).toSet
          val incremental = prior.filter { p =>
            p.analyzedVersion < v &&
              wanted.forall(p.cols.contains) && {
              // appends-only since the analyzed version? Both the FILE
              // set (a remove/rewrite means sketches cannot unmerge)
              // and the DELETION VECTORS must be unchanged: a DV-mode
              // delete removes rows without touching the file set, so
              // the file-set test alone would take the incremental
              // path and appendsSince would refuse (r17 advice) —
              // fall back to a full recompute instead
              val prevM = TxLog.manifest(spark, path, p.analyzedVersion)
              prevM.files.toSet.subsetOf(m.files.toSet) && prevM.dv == m.dv
            }
          }
          val merged = incremental match {
            case Some(p) =>
              // union the appends slice into EVERY stored column, not
              // just the wanted subset: the written analyzedVersion
              // advances to v, so a column skipped here would lose the
              // (p.analyzedVersion, v] appends from its sketch forever
              val refresh = (wanted ++ p.cols.keys).distinct
                .filter(sketchable)
              val fresh = sketchAgg(
                TxLog.appendsSince(spark, path, p.analyzedVersion), refresh)
              val combined = refresh.map { n =>
                val old = p.cols.get(n)
                  .map(c => java.util.Base64.getDecoder.decode(c.sketchB64))
                  .getOrElse(Array.empty[Byte])
                val nw = fresh.getOrElse(n, Array.empty[Byte])
                n -> union(spark, old, nw)
              }.toMap
              estimate(spark, combined)
            case None =>
              // full recompute refreshes every previously-stored column
              // alongside the wanted ones — an explicit-cols ANALYZE
              // must never silently drop paid-for stats (r17 advice);
              // the extra columns ride the same table scan
              val all = (wanted ++
                prior.map(_.cols.keys.toSeq).getOrElse(Nil)).distinct
                .filter(sketchable)
              estimate(spark, sketchAgg(TxLog.read(spark, path), all))
          }
          val out = TableNdv(v, merged)
          write(spark, path, out)
          out
      }
    }

  private def union(spark: SparkSession, a: Array[Byte],
                    b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    import spark.implicits._
    Seq(a, b).toDF("s").agg(hll_union_agg(col("s")).as("u"))
      .head().getAs[Array[Byte]](0)
  }

  private def write(spark: SparkSession, path: String, t: TableNdv): Unit = {
    val fs = statsDir(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(statsDir(path))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("analyzedVersion", t.analyzedVersion)
    val cs = root.putObject("cols")
    t.cols.toSeq.sortBy(_._1).foreach { case (n, c) =>
      val o = cs.putObject(n)
      o.put("ndv", c.ndv)
      o.put("sketch", c.sketchB64)
    }
    val tmp = new Path(statsDir(path), s".ndv.json.tmp.${
      java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(om.writeValueAsBytes(root)) finally out.close()
    fs.delete(ndvPath(path), false)
    require(fs.rename(tmp, ndvPath(path)),
      s"TxLog.analyze: rename failed for ${ndvPath(path)}")
  }

  /** The persisted stats, if the table was ever ANALYZEd. */
  def read(spark: SparkSession, path: String): Option[TableNdv] = {
    val fs = statsDir(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = ndvPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(bytes)
      val cols = scala.collection.mutable.Map[String, ColNdv]()
      val it = root.get("cols").fields()
      while (it.hasNext) {
        val e = it.next()
        cols(e.getKey) = ColNdv(e.getValue.get("ndv").asLong(),
          e.getValue.get("sketch").asText())
      }
      Some(TableNdv(root.get("analyzedVersion").asLong(), cols.toMap))
    }
  }
}
