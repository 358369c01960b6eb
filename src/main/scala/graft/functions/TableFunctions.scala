package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.operators.{Dedup, Funnel, Ivf, Layout, Packing, Pq, Sampling, Similarity, Stats, TextOps}
import graft.storage.TxLog

/** Table-valued SQL functions over the flagship operators — the SQL
  * surface the reference's interactive app shape implies (gwasDB
  * app.R:82-176 drives everything through SQL strings against
  * Postgres; here the same front door reaches graft's operator
  * library): `SELECT * FROM graft_funnel('events', 'view,cart', ...)`.
  *
  * Each builder resolves its literal arguments at analysis time, runs
  * the corresponding Scala operator to obtain a logical plan, and
  * splices that plan into the outer query — so the SQL path IS the
  * Scala path (same plan, same pushdown, same results; spec-pinned by
  * SqlSurfaceSpec). Table arguments are view/table NAMES resolved
  * against the session catalog, TxLog arguments are table paths —
  * time travel is an optional version argument, the DataFrame API's
  * exact contract.
  */
object TableFunctions {

  private def active: SparkSession = SparkSession.active

  private def litStr(fn: String, what: String, e: Expression): String = e match {
    case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a non-null string literal, got $other")
  }

  /** A TxLog-table argument: accepts a filesystem path OR a registered
    * catalog NAME (resolved through `graft.catalog.warehouse`, exactly
    * like every TXLOG verb) — the TVFs and the verbs spell targets the
    * same way. */
  private def litPath(fn: String, what: String, e: Expression): String =
    graft.storage.Catalog.resolveTarget(active, litStr(fn, what, e))

  private def litLong(fn: String, what: String, e: Expression): Long = e match {
    case l: Literal if l.dataType == IntegerType && l.value != null =>
      l.value.asInstanceOf[Int].toLong
    case l: Literal if l.dataType == LongType && l.value != null =>
      l.value.asInstanceOf[Long]
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  /** Any non-null literal, unwrapped to its external value (strings
    * arrive as UTF8String — converted; numerics pass through). */
  private def litAny(fn: String, what: String, e: Expression): Any = e match {
    case l: Literal if l.value != null =>
      if (l.dataType == StringType) l.value.toString else l.value
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a non-null literal, got $other")
  }

  private def csv(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** A numeric literal as Double (integer, double or decimal). */
  private def litDouble(fn: String, what: String, e: Expression): Double = e match {
    case l: Literal if l.value != null => l.value match {
      case d: java.lang.Double => d.doubleValue
      case f: java.lang.Float => f.toDouble
      case i: java.lang.Integer => i.toDouble
      case n: java.lang.Long => n.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a numeric literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a numeric literal, got $other")
  }

  /** A query VECTOR argument: either an `array(…)` literal (any
    * foldable numeric-array expression — evaluated at analysis time)
    * or a CSV string literal `'0.1,0.2,…'`. Both spell the same
    * doubles, so SQL writers can pick whichever composes. */
  private def litVec(fn: String, what: String, e: Expression): Array[Double] = e match {
    case l: Literal if l.dataType == StringType && l.value != null =>
      l.value.toString.split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble)
    case arr if arr.foldable &&
        arr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
      val et = arr.dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      arr.eval() match {
        case null => throw new IllegalArgumentException(
          s"$fn: $what must not be null")
        case data: org.apache.spark.sql.catalyst.util.ArrayData =>
          data.toObjectArray(et).map {
            case d: java.lang.Double => d.doubleValue
            case f: java.lang.Float => f.toDouble
            case i: java.lang.Integer => i.toDouble
            case n: java.lang.Long => n.toDouble
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case other => throw new IllegalArgumentException(
              s"$fn: $what has a non-numeric element: $other")
          }
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an array literal or a CSV string literal, got $other")
  }

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    ExprBridge.logicalPlan(df)

  private def arity(fn: String, es: Seq[Expression], allowed: Range): Unit =
    require(allowed.contains(es.size),
      s"$fn takes ${allowed.start}" +
        (if (allowed.size > 1) s"..${allowed.last}" else "") +
        s" arguments, got ${es.size}")

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (name, info, builder) triples for
    * `SparkSessionExtensions.injectTableFunction` and the live-session
    * registry path in [[graft.GraftExtensions.register]]. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    ("graft_funnel",
      info("graft_funnel",
        "graft_funnel(table, steps_csv[, max_gap]) - ordered-step funnel over table(user_id, ts, event_type, event_id); max_gap like '30 minutes'"),
      (es: Seq[Expression]) => {
        arity("graft_funnel", es, 2 to 3)
        val tbl = litStr("graft_funnel", "table", es.head)
        val steps = csv(litStr("graft_funnel", "steps_csv", es(1)))
        val gap = es.lift(2).map(litStr("graft_funnel", "max_gap", _))
        plan(Funnel.funnel(active.table(tbl), steps, maxGap = gap))
      }),
    ("graft_bm25",
      info("graft_bm25",
        "graft_bm25(table, terms_csv, k) - BM25 top-k of table(doc_id, text) for the query terms"),
      (es: Seq[Expression]) => {
        arity("graft_bm25", es, 3 to 3)
        plan(TextOps.bm25(active.table(litStr("graft_bm25", "table", es.head)),
          csv(litStr("graft_bm25", "terms_csv", es(1))),
          k = litLong("graft_bm25", "k", es(2)).toInt))
      }),
    ("graft_dedup_survivors",
      info("graft_dedup_survivors",
        "graft_dedup_survivors(table) - exact-dedup survivor set (keep_id, n_copies, h) of table(doc_id, text)"),
      (es: Seq[Expression]) => {
        arity("graft_dedup_survivors", es, 1 to 1)
        plan(Dedup.exact(active.table(litStr("graft_dedup_survivors", "table", es.head))))
      }),
    ("graft_langid",
      info("graft_langid",
        "graft_langid(table) - n-gram language id over table(doc_id, text)"),
      (es: Seq[Expression]) => {
        arity("graft_langid", es, 1 to 1)
        plan(TextOps.langId(active.table(litStr("graft_langid", "table", es.head))))
      }),
    ("graft_text_quality",
      info("graft_text_quality",
        "graft_text_quality(table) - quality metrics over table(doc_id, text)"),
      (es: Seq[Expression]) => {
        arity("graft_text_quality", es, 1 to 1)
        plan(TextOps.quality(active.table(litStr("graft_text_quality", "table", es.head))))
      }),
    ("graft_txlog",
      info("graft_txlog",
        "graft_txlog(path[, version]) - snapshot read of the TxLog table at path; version time-travels"),
      (es: Seq[Expression]) => {
        arity("graft_txlog", es, 1 to 2)
        plan(TxLog.read(active, litPath("graft_txlog", "path", es.head),
          es.lift(1).map(litLong("graft_txlog", "version", _))))
      }),
    ("graft_txlog_history",
      info("graft_txlog_history",
        "graft_txlog_history(path) - commit history of the TxLog table at path"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_history", es, 1 to 1)
        plan(TxLog.history(active, litPath("graft_txlog_history", "path", es.head)))
      }),
    ("graft_txlog_tags",
      info("graft_txlog_tags",
        "graft_txlog_tags(path) - the table's retention-pinned named snapshots (tag, version)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_tags", es, 1 to 1)
        val p = litPath("graft_txlog_tags", "path", es.head)
        val s = active
        import s.implicits._
        plan(TxLog.tags(s, p).toSeq.sortBy(_._1).toDF("tag", "version"))
      }),
    ("graft_txlog_txns",
      info("graft_txlog_txns",
        "graft_txlog_txns(path) - the table's per-app idempotency watermarks (app_id, txn_version)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_txns", es, 1 to 1)
        val p = litPath("graft_txlog_txns", "path", es.head)
        val s = active
        import s.implicits._
        val v = TxLog.currentVersion(s, p).getOrElse(
          throw new IllegalArgumentException(s"graft_txlog_txns: no table at $p"))
        plan(TxLog.manifest(s, p, v).txns.toSeq.sortBy(_._1)
          .toDF("app_id", "txn_version"))
      }),
    ("graft_txlog_files",
      info("graft_txlog_files",
        "graft_txlog_files(path[, version]) - per-file metadata inventory of the TxLog snapshot (partition dir, rows, size, DV-deleted rows, skip stats)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_files", es, 1 to 2)
        plan(TxLog.files(active, litPath("graft_txlog_files", "path", es.head),
          es.lift(1).map(litLong("graft_txlog_files", "version", _))))
      }),
    ("graft_topk",
      info("graft_topk",
        "graft_topk(table, group_cols_csv, order_col, k[, 'desc'|'asc']) - top-k rows per group via the native TopKPerGroup operator (default desc)"),
      (es: Seq[Expression]) => {
        arity("graft_topk", es, 4 to 5)
        val fn = "graft_topk"
        val tbl = active.table(litStr(fn, "table", es.head))
        val groups = csv(litStr(fn, "group_cols_csv", es(1))).map(tbl(_))
        val oc = tbl(litStr(fn, "order_col", es(2)))
        val dir = es.lift(4).map(litStr(fn, "direction", _)).getOrElse("desc")
        require(dir == "desc" || dir == "asc", s"$fn: direction must be 'desc' or 'asc'")
        plan(graft.plans.TopK.topKPerGroup(tbl, groups,
          Seq(if (dir == "desc") oc.desc else oc.asc),
          litLong(fn, "k", es(3)).toInt))
      }),
    ("graft_txlog_appends",
      info("graft_txlog_appends",
        "graft_txlog_appends(path, since_version[, to_version]) - rows appended after since_version (append-only ranges; use graft_txlog_cdf otherwise)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_appends", es, 2 to 3)
        plan(TxLog.appendsSince(active,
          litPath("graft_txlog_appends", "path", es.head),
          litLong("graft_txlog_appends", "since_version", es(1)),
          es.lift(2).map(litLong("graft_txlog_appends", "to_version", _))))
      }),
    ("graft_txlog_between",
      info("graft_txlog_between",
        "graft_txlog_between(path, col, lo, hi[, version]) - range read with per-file stats skipping: only files whose [min,max] admit a match are planned"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_between", es, 4 to 5)
        val fn = "graft_txlog_between"
        plan(TxLog.readBetween(active, litPath(fn, "path", es.head),
          litStr(fn, "col", es(1)), litAny(fn, "lo", es(2)), litAny(fn, "hi", es(3)),
          es.lift(4).map(litLong(fn, "version", _))))
      }),
    ("graft_txlog_point",
      info("graft_txlog_point",
        "graft_txlog_point(path, col, value) - point lookup with Bloom-sidecar file skipping: only files whose filter admits the key are planned"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_point", es, 3 to 3)
        val fn = "graft_txlog_point"
        plan(TxLog.readByKey(active, litPath(fn, "path", es.head),
          litStr(fn, "col", es(1)), litAny(fn, "value", es(2))))
      }),
    ("graft_txlog_detail",
      info("graft_txlog_detail",
        "graft_txlog_detail(path) - one-row table summary: version, layout, size, metadata row count, constraint counts, schema"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_detail", es, 1 to 1)
        plan(TxLog.detail(active, litPath("graft_txlog_detail", "path", es.head)))
      }),
    ("graft_txlog_asof",
      info("graft_txlog_asof",
        "graft_txlog_asof(path, ts) - snapshot AS OF a wall-clock instant (ISO-8601 or 'yyyy-MM-dd HH:mm:ss')"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_asof", es, 2 to 2)
        val fn = "graft_txlog_asof"
        plan(TxLog.readAsOf(active, litPath(fn, "path", es.head),
          TxLog.parseTsMillis(litStr(fn, "ts", es(1)))))
      }),
    ("graft_txlog_count",
      info("graft_txlog_count",
        "graft_txlog_count(path[, version]) - row count; metadata_only=true means zero data files were read (every file's rows in the manifest)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_count", es, 1 to 2)
        val fn = "graft_txlog_count"
        val p = litPath(fn, "path", es.head)
        val ver = es.lift(1).map(litLong(fn, "version", _))
        val (n, metaOnly) = TxLog.fastCount(active, p, ver) match {
          case Some(c) => (c, true)
          case None => (TxLog.read(active, p, ver).count(), false)
        }
        plan(active.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(n, metaOnly)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("rows",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("metadata_only",
              org.apache.spark.sql.types.BooleanType, nullable = false)))))
      }),
    ("graft_txlog_constraints",
      info("graft_txlog_constraints",
        "graft_txlog_constraints(path[, version]) - constraints in force at a version: (name, type CHECK|UNIQUE, definition), declaration order"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_constraints", es, 1 to 2)
        val fn = "graft_txlog_constraints"
        val p = litPath(fn, "path", es.head)
        val ver = es.lift(1).map(litLong(fn, "version", _))
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(
            (TxLog.constraintsOf(active, p, ver)
              .filterNot(_._1.startsWith("__prop__")) // see graft_txlog_properties
              .map(c =>
              org.apache.spark.sql.Row(c._1, "CHECK", c._2)) ++
             TxLog.uniquesOf(active, p, ver).map(u =>
              org.apache.spark.sql.Row(u._1, "UNIQUE",
                u._2.mkString(", ")))): _*)
        plan(active.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("name", StringType,
              nullable = false),
            org.apache.spark.sql.types.StructField("type", StringType,
              nullable = false),
            org.apache.spark.sql.types.StructField("definition", StringType,
              nullable = false)))))
      }),
    ("graft_txlog_properties",
      info("graft_txlog_properties",
        "graft_txlog_properties(path[, version]) - table properties in force at a version: (key, value), key order"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_properties", es, 1 to 2)
        val fn = "graft_txlog_properties"
        val p = litPath(fn, "path", es.head)
        val ver = es.lift(1).map(litLong(fn, "version", _))
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(
            TxLog.propertiesOf(active, p, ver).toSeq.sortBy(_._1).map {
              case (k, v) => org.apache.spark.sql.Row(k, v)
            }: _*)
        plan(active.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("key", StringType,
              nullable = false),
            org.apache.spark.sql.types.StructField("value", StringType,
              nullable = false)))))
      }),
    ("graft_txlog_partitions",
      info("graft_txlog_partitions",
        "graft_txlog_partitions(path[, version]) - per-partition file/row/byte aggregates of a snapshot (metadata only)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_partitions", es, 1 to 2)
        val fn = "graft_txlog_partitions"
        plan(TxLog.partitions(active, litPath(fn, "path", es.head),
          es.lift(1).map(litLong(fn, "version", _))))
      }),
    // ---- the similarity/ANN family through pure SQL: the same
    // serving plans the Scala calls build (Ivf.query, Pq.ivfQuery,
    // Similarity.annJoin) spliced into the outer query — partition
    // pruning to the nprobe probed cells included, spec-pinned by
    // SqlSurfaceSpec. The index is the OFFLINE artifact Ivf.fit /
    // Pq.loadOrBuildIvfPq wrote; a SQL-only user queries it with
    // nothing but a path and a vector. ----
    ("graft_ann",
      info("graft_ann",
        "graft_ann(index_path, query_vec, k[, nprobe]) - IVF ANN top-k (vec_id, cosine) against the index at path; query_vec is an array literal or CSV string"),
      (es: Seq[Expression]) => {
        arity("graft_ann", es, 3 to 4)
        val fn = "graft_ann"
        val s = active
        val index = Ivf.load(s, litStr(fn, "index_path", es.head))
        plan(Ivf.query(s, index, litVec(fn, "query_vec", es(1)),
          k = litLong(fn, "k", es(2)).toInt,
          nprobe = es.lift(3).map(litLong(fn, "nprobe", _).toInt).getOrElse(4)))
      }),
    ("graft_ann_pq",
      info("graft_ann_pq",
        "graft_ann_pq(index_path, query_vec, k[, nprobe[, shortlist]]) - IVF-PQ ANN top-k: partition-pruned ADC shortlist + exact re-rank, against the artifacts Pq.loadOrBuildIvfPq wrote"),
      (es: Seq[Expression]) => {
        arity("graft_ann_pq", es, 3 to 5)
        val fn = "graft_ann_pq"
        val s = active
        val path = litStr(fn, "index_path", es.head)
        // the codes on disk are only valid against a residual-space
        // model — refuse raw-era artifacts the same way the loader does
        require(Pq.savedEncoding(s, path) == "residual",
          s"$fn: the PQ artifacts at $path are not residual-encoded — " +
            "rebuild via Pq.loadOrBuildIvfPq")
        val index = Ivf.load(s, path)
        val model = Pq.load(s, path)
        plan(Pq.ivfQuery(s, index, model, litVec(fn, "query_vec", es(1)),
          k = litLong(fn, "k", es(2)).toInt,
          nprobe = es.lift(3).map(litLong(fn, "nprobe", _).toInt).getOrElse(8),
          shortlist = es.lift(4).map(litLong(fn, "shortlist", _).toInt)
            .getOrElse(100)))
      }),
    ("graft_ann_join",
      info("graft_ann_join",
        "graft_ann_join(left_table, right_table, min_cosine) - LSH-bucketed cross-corpus similarity join of two (vec_id, embedding) tables: candidate pairs from shared buckets, exact cosine verify"),
      (es: Seq[Expression]) => {
        arity("graft_ann_join", es, 3 to 3)
        val fn = "graft_ann_join"
        plan(Similarity.annJoin(
          active.table(litStr(fn, "left_table", es.head)),
          active.table(litStr(fn, "right_table", es(1))),
          minCosine = litDouble(fn, "min_cosine", es(2))))
      }),
    ("graft_dedup_semantic",
      info("graft_dedup_semantic",
        "graft_dedup_semantic(state_path) - the persisted SemDeDup disposition (vec_id, cell, component, centroid_cos, keep) maintained by Dedup.semanticDedupInit/Append"),
      (es: Seq[Expression]) => {
        arity("graft_dedup_semantic", es, 1 to 1)
        plan(Dedup.semanticState(active,
          litStr("graft_dedup_semantic", "state_path", es.head)))
      }),
    // ---- the eval family through pure SQL (same splice pattern):
    // score tables live beside the operators that produced them ----
    ("graft_eval_rank",
      info("graft_eval_rank",
        "graft_eval_rank(pred_table, truth_table, k) - NDCG@k/MRR/P@k per query over pred(query_id, item_id, rank) vs truth(query_id, item_id, rel)"),
      (es: Seq[Expression]) => {
        arity("graft_eval_rank", es, 3 to 3)
        val fn = "graft_eval_rank"
        plan(Stats.rankEval(
          active.table(litStr(fn, "pred_table", es.head)),
          active.table(litStr(fn, "truth_table", es(1))),
          k = litLong(fn, "k", es(2)).toInt))
      }),
    ("graft_eval_auc",
      info("graft_eval_auc",
        "graft_eval_auc(table, group_col, score_col, label_col) - group-wise ROC AUC (Mann-Whitney, average-rank ties)"),
      (es: Seq[Expression]) => {
        arity("graft_eval_auc", es, 4 to 4)
        val fn = "graft_eval_auc"
        plan(Stats.auc(active.table(litStr(fn, "table", es.head)),
          litStr(fn, "group_col", es(1)), litStr(fn, "score_col", es(2)),
          litStr(fn, "label_col", es(3))))
      }),
    ("graft_eval_calibration",
      info("graft_eval_calibration",
        "graft_eval_calibration(table, score_col, label_col[, bins]) - reliability table: per-bin (n, mean_score, pos_rate, abs_gap)"),
      (es: Seq[Expression]) => {
        arity("graft_eval_calibration", es, 3 to 4)
        val fn = "graft_eval_calibration"
        plan(Stats.calibration(active.table(litStr(fn, "table", es.head)),
          litStr(fn, "score_col", es(1)), litStr(fn, "label_col", es(2)),
          bins = es.lift(3).map(litLong(fn, "bins", _).toInt).getOrElse(10)))
      }),
    ("graft_eval_pr",
      info("graft_eval_pr",
        "graft_eval_pr(table, score_col, label_col[, bins]) - precision/recall operating-point table at equal-width thresholds"),
      (es: Seq[Expression]) => {
        arity("graft_eval_pr", es, 3 to 4)
        val fn = "graft_eval_pr"
        plan(Stats.prCurve(active.table(litStr(fn, "table", es.head)),
          litStr(fn, "score_col", es(1)), litStr(fn, "label_col", es(2)),
          bins = es.lift(3).map(litLong(fn, "bins", _).toInt).getOrElse(10)))
      }),
    // ---- the sampling/packing/split family through pure SQL (r16 —
    // same splice pattern): the curation steps a SQL-only user could
    // not run before. Determinism contracts ride through unchanged:
    // the same salt reproduces the identical set on any engine. ----
    ("graft_sample_per_group",
      info("graft_sample_per_group",
        "graft_sample_per_group(table, group_col, k[, id_col[, salt]]) - deterministic fixed-k uniform sample per group (salted md5 draw through the native TopKPerGroup operator; same salt = identical set)"),
      (es: Seq[Expression]) => {
        arity("graft_sample_per_group", es, 3 to 5)
        val fn = "graft_sample_per_group"
        val tbl = active.table(litStr(fn, "table", es.head))
        plan(Sampling.perGroupK(tbl,
          tbl(litStr(fn, "group_col", es(1))),
          k = litLong(fn, "k", es(2)).toInt,
          idCol = es.lift(3).map(litStr(fn, "id_col", _)).getOrElse("doc_id"),
          salt = es.lift(4).map(litStr(fn, "salt", _)).getOrElse("s0")))
      }),
    ("graft_sample_stratified",
      info("graft_sample_stratified",
        "graft_sample_stratified(table, stratum_col, frac[, id_col]) - exact deterministic stratified sample: ceil(frac*n) rows per stratum by md5-of-id order"),
      (es: Seq[Expression]) => {
        arity("graft_sample_stratified", es, 3 to 4)
        val fn = "graft_sample_stratified"
        val tbl = active.table(litStr(fn, "table", es.head))
        plan(Sampling.stratified(tbl,
          tbl(litStr(fn, "stratum_col", es(1))),
          frac = litDouble(fn, "frac", es(2)),
          idCol = es.lift(3).map(litStr(fn, "id_col", _)).getOrElse("doc_id")))
      }),
    ("graft_pack_sequences",
      info("graft_pack_sequences",
        "graft_pack_sequences(table, tokens_col, budget[, id_col]) - greedy id-ordered sequence packing: (id, n_tokens, offset, seq_id) with seq_id = offset / budget"),
      (es: Seq[Expression]) => {
        arity("graft_pack_sequences", es, 3 to 4)
        val fn = "graft_pack_sequences"
        val tbl = active.table(litStr(fn, "table", es.head))
        plan(Packing.packSequences(tbl,
          tbl(litStr(fn, "tokens_col", es(1))),
          budget = litLong(fn, "budget", es(2)).toInt,
          idCol = es.lift(3).map(litStr(fn, "id_col", _)).getOrElse("doc_id")))
      }),
    ("graft_split_leakage_safe",
      info("graft_split_leakage_safe",
        "graft_split_leakage_safe(docs_table, pairs_table, val_frac[, id_col]) - train/val split where near-dup CLUSTERS (connected components of pairs(doc_a, doc_b)) never straddle the cut"),
      (es: Seq[Expression]) => {
        arity("graft_split_leakage_safe", es, 3 to 4)
        val fn = "graft_split_leakage_safe"
        plan(Dedup.leakageSafeSplit(
          active.table(litStr(fn, "docs_table", es.head)),
          active.table(litStr(fn, "pairs_table", es(1))),
          valFrac = litDouble(fn, "val_frac", es(2)),
          idCol = es.lift(3).map(litStr(fn, "id_col", _)).getOrElse("doc_id")))
      }),
    ("graft_split_kfold",
      info("graft_split_kfold",
        "graft_split_kfold(docs_table, pairs_table, k[, id_col]) - leakage-safe k-fold assignment: near-dup clusters share a fold"),
      (es: Seq[Expression]) => {
        arity("graft_split_kfold", es, 3 to 4)
        val fn = "graft_split_kfold"
        plan(Dedup.kfoldSplit(
          active.table(litStr(fn, "docs_table", es.head)),
          active.table(litStr(fn, "pairs_table", es(1))),
          k = litLong(fn, "k", es(2)).toInt,
          idCol = es.lift(3).map(litStr(fn, "id_col", _)).getOrElse("doc_id")))
      }),
    ("graft_table_health",
      info("graft_table_health",
        "graft_table_health(path[, target_mb]) - the maintenance advisor: per-partition file/size/small-file stats with a compaction recommendation"),
      (es: Seq[Expression]) => {
        arity("graft_table_health", es, 1 to 2)
        val fn = "graft_table_health"
        plan(Layout.tableHealth(active, litPath(fn, "path", es.head),
          targetBytes = es.lift(1).map(litLong(fn, "target_mb", _))
            .getOrElse(128L) << 20))
      }),
    ("graft_txlog_cdf",
      info("graft_txlog_cdf",
        "graft_txlog_cdf(path, from_version, to_version[, keys_csv]) - change-data feed between two versions: with keys, the per-key snapshot diff; without, the keyless write-time capture feed (needs graft.changeDataFeed)"),
      (es: Seq[Expression]) => {
        arity("graft_txlog_cdf", es, 3 to 4)
        val p = litPath("graft_txlog_cdf", "path", es.head)
        val from = litLong("graft_txlog_cdf", "from_version", es(1))
        val to = litLong("graft_txlog_cdf", "to_version", es(2))
        es.lift(3) match {
          case Some(k) => plan(TxLog.changes(active, p, from, to,
            csv(litStr("graft_txlog_cdf", "keys_csv", k))))
          case None => plan(TxLog.changeFeed(active, p, from, to))
        }
      }),
  )
}
