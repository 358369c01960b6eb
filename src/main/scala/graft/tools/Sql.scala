package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.tables.Tables

/** Ad-hoc SQL entry point over the test star schema — the engine's
  * interactive front door, standing in for the reference's Shiny/dbplyr
  * app (gwasDB/app.R). Usage:
  *
  *   sbt "runMain graft.tools.Sql /root/testdata/sf0.01 \
  *     SELECT l_suppkey, count(*) FROM lineitem GROUP BY 1 ORDER BY 1"
  *
  * Every driver table registers as a temp view under its own name, so
  * each `SparkEntry.oracleSql` query (ANSI SQL) runs here verbatim.
  * The same `registerAll` + `spark.sql` pair is what a long-running
  * SQL endpoint (Spark Connect / Thrift) would serve per request.
  *
  * Beyond plain SQL, [[exec]] adds the TXLOG write verbs (reads are
  * already pure SQL via the `graft_txlog*` table functions —
  * [[graft.functions.TableFunctions]]):
  *
  *   TXLOG CREATE [OR REPLACE] '<path>' [PARTITION BY <c1[,c2...]>] AS <select>
  *   TXLOG CREATE '<path>' HIDDEN PARTITION BY <days(ts)|bucket(n,c)|...> AS <select>
  *   TXLOG APPEND INTO '<path>' [TXN ('<appId>', <n>)] <select>  -- TXN = idempotent lane
  *   TXLOG MERGE INTO '<path>' ON <k1[,k2...]> USING <select> [USING DELETION VECTORS]
  *   TXLOG MERGE INTO '<path>' ON <k1[,k2...]> USING (<select>)
  *     [WHEN MATCHED [AND <cond>] THEN UPDATE SET <a = e[, ...]> | DELETE]...
  *     [WHEN NOT MATCHED [AND <cond>] THEN INSERT]
  *     [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]...
  *     [USING DELETION VECTORS]
  *     -- conditions/SETs see target columns + the source row as `src.<col>`
  *   TXLOG DELETE FROM '<path>' WHERE <condition> [USING DELETION VECTORS]
  *   TXLOG UPDATE '<path>' SET <c1> = <expr1>[, <c2> = <expr2>...] WHERE <condition> [USING DELETION VECTORS]
  *   TXLOG REPLACE INTO '<path>' PARTITIONS (<v1[,v2...]>) <select>
  *   TXLOG REPLACE INTO '<path>' WHERE (<predicate>) <select>  -- Delta's replaceWhere
  *   TXLOG RESTORE '<path>' TO VERSION <n> | TO TIMESTAMP '<ts>' | TO TAG '<name>'
  *   TXLOG CLONE '<src>' TO '<dst>' [DEEP] [VERSION <n>]
  *   TXLOG ALTER '<path>' ADD CONSTRAINT <name> CHECK (<expr>)
  *   TXLOG ALTER '<path>' ADD CONSTRAINT <name> UNIQUE (<k1[,k2...]>)
  *   TXLOG ALTER '<path>' DROP CONSTRAINT <name>
  *   TXLOG ALTER '<path>' RENAME COLUMN <old> TO <new>
  *   TXLOG ALTER '<path>' ADD COLUMN <name> <type> [GENERATED AS (<expr>) | DEFAULT <expr>]
  *   TXLOG ALTER '<path>' ALTER COLUMN <name> SET DEFAULT <expr> | DROP DEFAULT
  *   TXLOG ALTER '<path>' DROP COLUMN <name>
  *   TXLOG ALTER '<path>' ALTER COLUMN <name> TYPE <type>  -- widening only, metadata-only
  *   TXLOG ALTER '<path>' SET HIDDEN PARTITION BY <days(ts)|bucket(n,c)|...>  -- partition evolution
  *   TXLOG ALTER '<path>' SET STATS COLS (<c1[,c2...]>)  -- () disables
  *   TXLOG OPTIMIZE '<path>' [PARTITIONS (<v1[,v2...]>)] [ZORDER BY <c1>[, <c2>, ...]]
  *   TXLOG VACUUM '<path>' [RETAIN <n> VERSIONS] [RETAIN <h> HOURS] [DRY RUN]
  *   TXLOG CONVERT '<dir>' [PARTITION BY <c1[,c2...]>] [STATS COLS (<c1[,c2...]>)]
  *   TXLOG TAG '<path>' <name> [VERSION <n>]   -- retention-pinned named snapshot
  *   TXLOG UNTAG '<path>' <name>
  *   TXLOG TAGS '<path>'
  *
  * — the delegating-dispatcher pattern a transactional layer uses
  * before it owns a parser extension: anything that isn't a TXLOG verb
  * goes to `spark.sql` verbatim. Each verb returns a one-row
  * (version BIGINT) result, the committed version (VACUUM returns
  * (deleted_files BIGINT) — it frees storage, it does not commit).
  */
object Sql {

  private val CreateOrReplaceRe =
    """(?is)\s*TXLOG\s+CREATE\s+OR\s+REPLACE\s+'([^']+)'\s*(?:PARTITION\s+BY\s+(\w+(?:\s*,\s*\w+)*)\s+)?AS\s+(.+)""".r
  private val CreateHiddenRe =
    """(?is)\s*TXLOG\s+CREATE\s+'([^']+)'\s+HIDDEN\s+PARTITION\s+BY\s+(.+?)\s+AS\s+(.+)""".r
  private val CreateRe =
    """(?is)\s*TXLOG\s+CREATE\s+'([^']+)'\s*(?:PARTITION\s+BY\s+(\w+(?:\s*,\s*\w+)*)\s+)?AS\s+(.+)""".r
  private val AppendTxnRe =
    """(?is)\s*TXLOG\s+APPEND\s+INTO\s+'([^']+)'\s+TXN\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*\)\s+(.+)""".r
  private val AppendRe =
    """(?is)\s*TXLOG\s+APPEND\s+INTO\s+'([^']+)'\s+(.+)""".r
  private val ApplyChangesRe =
    """(?is)\s*TXLOG\s+APPLY\s+CHANGES\s+INTO\s+'([^']+)'\s+ON\s+([\w,\s]+?)\s+(SELECT.+)""".r
  // no ON clause = the KEYLESS event-feed consumer (multiset apply)
  private val ApplyChangeEventsRe =
    """(?is)\s*TXLOG\s+APPLY\s+CHANGES\s+INTO\s+'([^']+)'\s+(SELECT.+)""".r
  private val CopyIntoRe =
    """(?is)\s*TXLOG\s+COPY\s+INTO\s+'([^']+)'\s+FROM\s+'([^']+)'\s*(?:FORMAT\s+(\w+))?\s*(?:PATTERN\s+'([^']+)')?\s*(FORCE)?\s*(MERGESCHEMA)?\s*""".r
  private val MergeWhenHeadRe =
    """(?is)\s*TXLOG\s+MERGE\s+INTO\s+'([^']+)'\s+ON\s+([\w,\s]+?)\s+USING\s+\((.+)""".r

  /** Extractor for the conditional-MERGE statement. A lazy regex
    * capture of `USING (...)` stops at the first `) WHEN`, so a source
    * subquery containing `CASE ... WHEN` mis-parses into a truncated
    * select — instead, scan for the close paren that BALANCES the
    * USING open (tracking nesting and single-quoted strings) and claim
    * the statement only when a WHEN tail follows; otherwise fall
    * through to the unconditional-merge forms. */
  private object MergeWhenStmt {
    def unapply(sql: String): Option[(String, String, String, String)] =
      sql match {
        case MergeWhenHeadRe(path, keys, rest) =>
          var depth = 1; var i = 0
          var quote: Char = 0
          while (i < rest.length && depth > 0) {
            val c = rest.charAt(i)
            if (quote != 0) { if (c == quote) quote = 0 }
            else c match {
              case '\'' | '"' => quote = c
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            i += 1
          }
          if (depth != 0) None
          else {
            val select = rest.substring(0, i - 1)
            val tail = rest.substring(i).trim
            if (tail.toUpperCase.startsWith("WHEN"))
              Some((path, keys, select, tail))
            else None
          }
        case _ => None
      }
  }
  private val MergeDvRe =
    """(?is)\s*TXLOG\s+MERGE\s+INTO\s+'([^']+)'\s+ON\s+([\w,\s]+?)\s+USING\s+(.+?)\s+USING\s+DELETION\s+VECTORS\s*""".r
  private val MergeRe =
    """(?is)\s*TXLOG\s+MERGE\s+INTO\s+'([^']+)'\s+ON\s+([\w,\s]+?)\s+USING\s+(.+)""".r

  /** Positions of TOP-LEVEL occurrences of keyword `kw` in `s`: not
    * inside parentheses, not inside single-quoted strings, and not
    * inside a CASE ... END block — so a clause condition's or SET
    * expression's own `CASE WHEN x THEN y END` never splits the MERGE
    * grammar, which a lazy-regex split did. Word-bounded,
    * case-insensitive. */
  private def topLevelPositions(s: String, kw: String): Seq[Int] = {
    val up = s.toUpperCase
    val k = kw.toUpperCase
    def wordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(pos: Int, w: String): Boolean =
      up.startsWith(w, pos) &&
        (pos == 0 || !wordChar(up.charAt(pos - 1))) &&
        (pos + w.length >= up.length || !wordChar(up.charAt(pos + w.length)))
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0; var depth = 0; var caseDepth = 0
    var quote: Char = 0 // 0 = outside; otherwise the open quote char
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (wordAt(i, "CASE")) { caseDepth += 1; i += 4 }
      else if (wordAt(i, "END")) { caseDepth = math.max(0, caseDepth - 1); i += 3 }
      else if (depth == 0 && caseDepth == 0 && wordAt(i, k)) { out += i; i += k.length }
      else i += 1
    }
    out.toSeq
  }

  /** Parse the WHEN-clause tail of a conditional MERGE into
    * [[graft.storage.TxLog.MergeClause]] triples. Grammar:
    *   WHEN MATCHED [AND <cond>] THEN UPDATE SET a = e[, ...]
    *   WHEN MATCHED [AND <cond>] THEN DELETE
    *   WHEN NOT MATCHED [AND <cond>] THEN INSERT
    *   WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
    * Conditions and SET expressions see the target row's columns plus
    * the source row as a struct named `src`. Clause boundaries come
    * from [[topLevelPositions]], so conditions and SETs may themselves
    * contain CASE ... WHEN ... THEN ... END (searched and simple CASE
    * alike). */
  private val WhenKindRe =
    """(?is)WHEN\s+(MATCHED|NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED)\b(.*)""".r
  private def parseWhenClauses(tail: String)
      : (Seq[graft.storage.TxLog.MergeClause],
         Seq[graft.storage.TxLog.MergeClause],
         Seq[graft.storage.TxLog.MergeClause]) = {
    import graft.storage.TxLog.MergeClause
    val t = tail.trim
    val whens = topLevelPositions(t, "WHEN")
    require(whens.nonEmpty && whens.head == 0,
      s"Sql: no parsable WHEN clauses in '$tail'")
    val clauses = whens.zip(whens.drop(1) :+ t.length)
      .map { case (a, b) => t.substring(a, b).trim }
    var matched = Seq.empty[MergeClause]
    var notMatched = Seq.empty[MergeClause]
    var nms = Seq.empty[MergeClause]
    clauses.foreach { cl =>
      val (kind, rest) = cl match {
        case WhenKindRe(kindRaw, r) =>
          (kindRaw.toUpperCase.replaceAll("\\s+", " "), r.trim)
        case _ => throw new IllegalArgumentException(
          s"Sql: unparsable WHEN clause '$cl'")
      }
      val thens = topLevelPositions(rest, "THEN")
      require(thens.nonEmpty, s"Sql: WHEN clause missing THEN: '$cl'")
      val condPart = rest.substring(0, thens.head).trim
      val cond =
        if (condPart.isEmpty) None
        else {
          require(condPart.toUpperCase.startsWith("AND"),
            s"Sql: expected [AND <cond>] THEN in '$cl'")
          Some(condPart.substring(3).trim).filter(_.nonEmpty)
        }
      val action = rest.substring(thens.head + 4).trim
      val au = action.toUpperCase
      kind match {
        case "MATCHED" if au.startsWith("UPDATE") =>
          matched :+= MergeClause(cond, "update",
            parseSets(action.replaceFirst("(?is)UPDATE\\s+SET\\s+", "")))
        case "MATCHED" if au == "DELETE" =>
          matched :+= MergeClause(cond, "delete")
        case "NOT MATCHED" if au == "INSERT" =>
          notMatched :+= MergeClause(cond, "insert")
        case "NOT MATCHED BY SOURCE" if au == "DELETE" =>
          nms :+= MergeClause(cond, "delete")
        case other => throw new IllegalArgumentException(
          s"Sql: WHEN $other THEN $action is not a supported merge clause")
      }
    }
    (matched, notMatched, nms)
  }
  private val DeleteDvRe =
    """(?is)\s*TXLOG\s+DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s+USING\s+DELETION\s+VECTORS\s*""".r
  private val DeleteRe =
    """(?is)\s*TXLOG\s+DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+)""".r
  private val UpdateDvRe =
    """(?is)\s*TXLOG\s+UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s+USING\s+DELETION\s+VECTORS\s*""".r
  private val UpdateRe =
    """(?is)\s*TXLOG\s+UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+)""".r
  private val ReplaceWhereRe =
    """(?is)\s*TXLOG\s+REPLACE\s+INTO\s+'([^']+)'\s+WHERE\s*\((.+?)\)\s+(SELECT.+)""".r
  private val ReplaceRe =
    """(?is)\s*TXLOG\s+REPLACE\s+INTO\s+'([^']+)'\s+PARTITIONS\s*\(([^)]+)\)\s+(.+)""".r
  private val RestoreRe =
    """(?is)\s*TXLOG\s+RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*""".r
  private val RestoreTsRe =
    """(?is)\s*TXLOG\s+RESTORE\s+'([^']+)'\s+TO\s+TIMESTAMP\s+'([^']+)'\s*""".r
  private val RestoreTagRe =
    """(?is)\s*TXLOG\s+RESTORE\s+'([^']+)'\s+TO\s+TAG\s+'?([\w.\-]+)'?\s*""".r
  private val CloneRe =
    """(?is)\s*TXLOG\s+CLONE\s+'([^']+)'\s+TO\s+'([^']+)'(\s+DEEP)?(?:\s+VERSION\s+(\d+))?\s*""".r
  private val AlterAddUniqueRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+UNIQUE\s*\(([^)]+)\)\s*""".r
  private val AlterAddRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""".r
  private val AlterStatsRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+SET\s+STATS\s+COLS\s*\(([^)]*)\)\s*""".r
  private val AlterDropRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r
  private val AlterRenameRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val AlterPartSpecRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+SET\s+HIDDEN\s+PARTITION\s+BY\s+(.+?)\s*""".r
  private val AlterAddColGenRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s+GENERATED\s+AS\s*\((.+)\)\s*""".r
  private val AlterAddColDefRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s+DEFAULT\s+(.+?)\s*""".r
  private val AlterSetDefaultRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+DEFAULT\s+(.+?)\s*""".r
  private val AlterDropDefaultRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+DROP\s+DEFAULT\s*""".r
  // greedy body up to the LAST ')': values containing ')' or ',' are
  // legal inside their quotes — the quote-aware pair walk below (not a
  // naive comma split) tokenizes them (r14 advice)
  private val AlterSetPropsRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val AlterUnsetPropsRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+UNSET\s+TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val PropsRe =
    """(?is)\s*TXLOG\s+PROPERTIES\s+'([^']+)'\s*""".r
  private val AlterAddColRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*""".r
  private val AlterDropColRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+DROP\s+COLUMN\s+(\w+)\s*""".r
  private val AlterColTypeRe =
    """(?is)\s*TXLOG\s+ALTER\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+?)\s*""".r
  private val OptimizeRe =
    """(?is)\s*TXLOG\s+OPTIMIZE\s+'([^']+)'\s*(?:PARTITIONS\s*\(([^)]+)\)\s*)?(?:ZORDER\s+BY\s+(\w+(?:\s*,\s*\w+)*))?\s*""".r
  private val VacuumRe =
    """(?is)\s*TXLOG\s+VACUUM\s+'([^']+)'\s*(?:RETAIN\s+(\d+)\s+VERSIONS)?\s*(?:RETAIN\s+([\d.]+)\s+HOURS)?(\s+DRY\s+RUN)?\s*""".r
  private val TagRe =
    """(?is)\s*TXLOG\s+TAG\s+'([^']+)'\s+([\w.\-]+)\s*(?:VERSION\s+(\d+))?\s*""".r
  private val UntagRe =
    """(?is)\s*TXLOG\s+UNTAG\s+'([^']+)'\s+([\w.\-]+)\s*""".r
  private val TagsRe =
    """(?is)\s*TXLOG\s+TAGS\s+'([^']+)'\s*""".r
  private val ConvertRe =
    """(?is)\s*TXLOG\s+CONVERT\s+'([^']+)'\s*(?:PARTITION\s+BY\s+(\w+(?:\s*,\s*\w+)*))?\s*(?:STATS\s+COLS\s*\(([^)]*)\))?\s*""".r

  /** `a = expr, b = expr` → assignment pairs: split on commas OUTSIDE
    * parentheses (a CASE/function expression keeps its own), then on
    * each item's FIRST '=' (the expression may contain more). */
  private def parseSets(s: String): Seq[(String, String)] =
    s.split(",(?![^(]*\\))").toSeq.map(_.trim).filter(_.nonEmpty).map { item =>
      val i = item.indexOf('=')
      require(i > 0, s"Sql: malformed SET item '$item' — expected col = expr")
      (item.substring(0, i).trim, item.substring(i + 1).trim)
    }

  /** Split a statement list on TOP-LEVEL semicolons — outside quotes
    * and parens, so a subquery's own literals never split the block. */
  private def splitStatements(s: String,
                              backslashEscapes: Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0; var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        // default Spark lexing escapes with BACKSLASH as well as the
        // doubled-quote form — skip the escaped char so a literal like
        // 'it\'s; done' cannot fake a top-level semicolon. Under the
        // legacy escapedStringLiterals=true lexer a backslash is a
        // plain character, so the skip must mirror the session conf or
        // 'C:\' would swallow its own closing quote.
        if (backslashEscapes && c == '\\' && i + 1 < s.length) i += 1
        else if (c == quote) quote = 0
      }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ';' && depth == 0) {
        out += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse ONE TXLOG DML statement into a [[graft.storage.Txn.Op]] —
    * the subset a transaction block admits: each op is one table
    * commit the saga can compensate with a RESTORE. Maintenance verbs
    * (VACUUM, OPTIMIZE, CLONE, ALTER, ...) are refused: they are not
    * data ops a rollback should ever undo. */
  private[graft] def parseTxnOp(spark: SparkSession, sql: String)
      : graft.storage.Txn.Op = {
    import graft.storage.Txn
    def rt(p: String) = graft.storage.Catalog.resolveTarget(spark, p)
    def keysOf(keys: String) =
      keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    sql match {
      case AppendRe(path, select) => Txn.Append(rt(path), spark.sql(select))
      case MergeWhenStmt(path, keys, select, whenTail) =>
        val (m, nm, nms) = parseWhenClauses(whenTail)
        Txn.MergeWhen(rt(path), spark.sql(select), keysOf(keys), m, nm, nms)
      case MergeRe(path, keys, select) =>
        Txn.Merge(rt(path), spark.sql(select), keysOf(keys))
      case UpdateRe(path, sets, cond) =>
        Txn.Update(rt(path), parseSets(sets),
          org.apache.spark.sql.functions.expr(cond))
      case DeleteRe(path, cond) =>
        Txn.Delete(rt(path), org.apache.spark.sql.functions.expr(cond))
      case other => throw new IllegalArgumentException(
        "Sql: a TXN block supports the DML verbs only — TXLOG APPEND " +
          "INTO / MERGE INTO / UPDATE / DELETE FROM — got: " +
          other.trim.take(120))
    }
  }

  /** The TXN block's engine: parse each statement, run them through
    * [[graft.storage.Txn.transact]] (journaled saga, all-or-nothing
    * OUTCOME, warehouse-rooted journal), return the version per op. */
  private[graft] def execTxnOps(spark: SparkSession, body: String): Seq[Long] = {
    val wh = spark.conf.getOption("graft.catalog.warehouse").getOrElse(
      throw new IllegalArgumentException(
        "TXLOG TXN: set graft.catalog.warehouse — the warehouse is the " +
          "transaction journal root"))
    val stmts = splitStatements(body,
      backslashEscapes = !spark.sessionState.conf.escapedStringLiterals)
    require(stmts.nonEmpty, "Sql: empty TXN block")
    graft.storage.Txn.transact(spark, wh, stmts.map(parseTxnOp(spark, _)))
  }

  private val TxnRe =
    """(?is)\s*TXLOG\s+TXN\s+BEGIN\s*;(.*?);?\s*COMMIT\s*""".r

  /** Run one statement: a TXLOG verb or plain SQL. Verb targets may
    * be filesystem paths OR bare catalog NAMES (when
    * `graft.catalog.warehouse` is set): reads/writes resolve through
    * [[graft.storage.Catalog]], and a CREATE with a name lands the
    * table at `<warehouse>/<name>` and registers it. */
  def exec(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    def asDf(v: Long): DataFrame = Seq(v).toDF("version")
    def rt(p: String): String = graft.storage.Catalog.resolveTarget(spark, p)
    // CREATE targets: a bare name materializes under the warehouse and
    // registers AFTER the create commits
    def createTarget(p: String): (String, () => Unit) =
      if (graft.storage.Catalog.isName(p) &&
          spark.conf.getOption("graft.catalog.warehouse").isDefined) {
        val dir = new org.apache.hadoop.fs.Path(
          spark.conf.get("graft.catalog.warehouse"), p).toString
        (dir, () => graft.storage.Catalog.register(spark, p, dir))
      } else (p, () => ())
    sql match {
      case TxnRe(body) =>
        execTxnOps(spark, body).zipWithIndex
          .map { case (v, i) => (i, v) }.toDF("op", "version")
      case CreateOrReplaceRe(path, part, select) =>
        val (dir, reg) = createTarget(path)
        val v = graft.storage.TxLog.createOrReplace(spark.sql(select), dir,
          partitionCols = Option(part).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
        reg(); asDf(v)
      case CreateHiddenRe(path, specs, select) =>
        // split on commas OUTSIDE parens: bucket(16, k) keeps its own
        val (dir, reg) = createTarget(path)
        val v = graft.storage.TxLog.create(spark.sql(select), dir,
          hiddenPartitions = specs.split(",(?![^(]*\\))").map(_.trim)
            .filter(_.nonEmpty).toSeq)
        reg(); asDf(v)
      case CreateRe(path, part, select) =>
        val (dir, reg) = createTarget(path)
        val v = graft.storage.TxLog.create(spark.sql(select), dir,
          partitionCols = Option(part).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
        reg(); asDf(v)
      case AppendTxnRe(path, appId, txnV, select) =>
        asDf(graft.storage.TxLog.appendTxn(spark.sql(select), rt(path),
          appId, txnV.toLong))
      // the CDC CONSUMER side in pure SQL: pair with the
      // graft_txlog_cdf TVF for a whole replication loop in one
      // statement — TXLOG APPLY CHANGES INTO 'replica' ON k
      // SELECT * FROM graft_txlog_cdf('primary', 1, 3, 'k')
      case ApplyChangesRe(path, keys, select) =>
        asDf(graft.storage.TxLog.applyChanges(rt(path), spark.sql(select),
          keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
      // keyless: TXLOG APPLY CHANGES INTO 'replica'
      // SELECT * FROM graft_txlog_cdf('primary', 1, 3) — the event
      // feed's multiset consumer for tables with no unique row identity
      case ApplyChangeEventsRe(path, select) =>
        asDf(graft.storage.TxLog.applyChangeEvents(rt(path),
          spark.sql(select)))
      case CopyIntoRe(path, srcDir, fmt, pat, force, mergeSch) =>
        val (n, v) = graft.storage.CopyInto.copyInto(spark, rt(path), srcDir,
          Option(fmt).map(_.toLowerCase).getOrElse("parquet"),
          pattern = Option(pat), force = force != null,
          mergeSchema = mergeSch != null)
        Seq((n.toLong, v)).toDF("files_loaded", "version")
      case AppendRe(path, select0) =>
        // WITH SCHEMA EVOLUTION rides as a suffix of the SELECT capture
        val AppendEv = """(?is)(.*?)\s+WITH\s+SCHEMA\s+EVOLUTION\s*$""".r
        val (select, evolve) = select0 match {
          case AppendEv(t) => (t, true)
          case t => (t, false)
        }
        asDf(graft.storage.TxLog.append(spark.sql(select), rt(path),
          evolveSchema = evolve))
      case MergeWhenStmt(path, keys, select, whenTail0) =>
        // trailing modifiers, either order: USING DELETION VECTORS
        // (merge-on-read) and WITH SCHEMA EVOLUTION (widen on commit)
        val DvSuffix = """(?is)(.*?)\s+USING\s+DELETION\s+VECTORS\s*$""".r
        val EvSuffix = """(?is)(.*?)\s+WITH\s+SCHEMA\s+EVOLUTION\s*$""".r
        var whenTail = whenTail0
        var dv = false
        var evolve = false
        var stripped = true
        while (stripped) {
          stripped = whenTail match {
            case DvSuffix(t) => whenTail = t; dv = true; true
            case EvSuffix(t) => whenTail = t; evolve = true; true
            case _ => false
          }
        }
        val (matched, notMatched, nms) = parseWhenClauses(whenTail)
        asDf(graft.storage.TxLog.mergeWhen(rt(path), spark.sql(select),
          keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          matched, notMatched, nms, deletionVectors = dv,
          evolveSchema = evolve))
      case MergeDvRe(path, keys, select) =>
        asDf(graft.storage.TxLog.mergeInto(rt(path), spark.sql(select),
          keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          deletionVectors = true))
      case MergeRe(path, keys, select0) =>
        // the plain upsert form: WITH SCHEMA EVOLUTION rides as a
        // suffix of the free-form SELECT capture
        val EvSuffix = """(?is)(.*?)\s+WITH\s+SCHEMA\s+EVOLUTION\s*$""".r
        val (select, evolve) = select0 match {
          case EvSuffix(t) => (t, true)
          case t => (t, false)
        }
        asDf(graft.storage.TxLog.mergeInto(rt(path), spark.sql(select),
          keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          evolveSchema = evolve))
      case UpdateDvRe(path, sets, cond) =>
        asDf(graft.storage.TxLog.updateWhere(spark, rt(path), parseSets(sets),
          org.apache.spark.sql.functions.expr(cond), deletionVectors = true))
      case UpdateRe(path, sets, cond) =>
        asDf(graft.storage.TxLog.updateWhere(spark, rt(path), parseSets(sets),
          org.apache.spark.sql.functions.expr(cond)))
      case DeleteDvRe(path, cond) =>
        asDf(graft.storage.TxLog.deleteWhere(spark, rt(path),
          org.apache.spark.sql.functions.expr(cond), deletionVectors = true))
      case DeleteRe(path, cond) =>
        asDf(graft.storage.TxLog.deleteWhere(spark, rt(path),
          org.apache.spark.sql.functions.expr(cond)))
      case ReplaceWhereRe(path, pred, select) =>
        asDf(graft.storage.TxLog.replaceWhere(spark.sql(select), rt(path),
          org.apache.spark.sql.functions.expr(pred)))
      case ReplaceRe(path, vals, select) =>
        asDf(graft.storage.TxLog.replacePartitions(spark.sql(select), rt(path),
          vals.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
            .filter(_.nonEmpty).toSeq))
      case RestoreRe(path, v) =>
        asDf(graft.storage.TxLog.restore(spark, rt(path), v.toLong))
      case RestoreTsRe(path, ts) =>
        asDf(graft.storage.TxLog.restore(spark, rt(path),
          graft.storage.TxLog.versionAt(spark, rt(path),
            graft.storage.TxLog.parseTsMillis(ts))))
      case RestoreTagRe(path, tagName) =>
        asDf(graft.storage.TxLog.restoreToTag(spark, rt(path), tagName))
      case CloneRe(src, dst, deep, ver) =>
        asDf(graft.storage.TxLog.clone(spark, rt(src), dst,
          version = Option(ver).map(_.toLong), deep = deep != null))
      case AlterAddUniqueRe(path, name, cols) =>
        asDf(graft.storage.TxLog.addUniqueConstraint(spark, rt(path), name,
          cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
      case AlterAddRe(path, name, check) =>
        asDf(graft.storage.TxLog.addConstraint(spark, rt(path), name, check))
      case AlterStatsRe(path, cols) =>
        asDf(graft.storage.TxLog.setStatsCols(spark, rt(path),
          cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
      case AlterDropRe(path, name) =>
        asDf(graft.storage.TxLog.dropConstraint(spark, rt(path), name))
      case AlterRenameRe(path, oldName, newName) =>
        asDf(graft.storage.TxLog.renameColumn(spark, rt(path), oldName, newName))
      case AlterPartSpecRe(path, specs) =>
        asDf(graft.storage.TxLog.alterPartitionSpec(spark, rt(path),
          specs.split(",(?![^(]*\\))").map(_.trim).filter(_.nonEmpty).toSeq))
      case AlterAddColGenRe(path, name, ddlType, genExpr) =>
        asDf(graft.storage.TxLog.addColumn(spark, rt(path), name,
          ddlType.trim, generatedAs = Some(genExpr.trim)))
      case AlterAddColDefRe(path, name, ddlType, defExpr) =>
        asDf(graft.storage.TxLog.addColumn(spark, rt(path), name,
          ddlType.trim, default = Some(defExpr.trim)))
      case AlterSetDefaultRe(path, name, defExpr) =>
        asDf(graft.storage.TxLog.setColumnDefault(spark, rt(path), name,
          defExpr.trim))
      case AlterDropDefaultRe(path, name) =>
        asDf(graft.storage.TxLog.dropColumnDefault(spark, rt(path), name))
      case AlterSetPropsRe(path, pairs) =>
        // quote-aware sequential walk: each step consumes one
        // 'key'='value' pair and an optional comma + tail, so quoted
        // values may contain ',' or ')' and any unparsed residue
        // refuses loudly instead of half-applying
        val pairStep = """(?s)\s*'([^']+)'\s*=\s*'([^']*)'\s*(?:,(.*))?""".r
        @annotation.tailrec
        def walk(rest: String, acc: Vector[(String, String)]): Vector[(String, String)] =
          rest match {
            case pairStep(k, v, tail) =>
              val a = acc :+ (k -> v)
              if (tail == null) a else walk(tail, a)
            case other => throw new IllegalArgumentException(
              "TXLOG ALTER ... SET TBLPROPERTIES: expected 'key'='value', " +
                s"got '${other.trim}'")
          }
        asDf(graft.storage.TxLog.setProperties(spark, rt(path),
          walk(pairs, Vector.empty).toMap))
      case AlterUnsetPropsRe(path, keys) =>
        val keyStep = """(?s)\s*'([^']+)'\s*(?:,(.*))?""".r
        @annotation.tailrec
        def walkKeys(rest: String, acc: Vector[String]): Vector[String] =
          rest match {
            case keyStep(k, tail) =>
              val a = acc :+ k
              if (tail == null) a else walkKeys(tail, a)
            case other => throw new IllegalArgumentException(
              "TXLOG ALTER ... UNSET TBLPROPERTIES: expected 'key', " +
                s"got '${other.trim}'")
          }
        asDf(graft.storage.TxLog.unsetProperties(spark, rt(path),
          walkKeys(keys, Vector.empty)))
      case PropsRe(path) =>
        graft.storage.TxLog.propertiesOf(spark, rt(path)).toSeq.sortBy(_._1)
          .toDF("key", "value")
      case AlterAddColRe(path, name, ddlType) =>
        asDf(graft.storage.TxLog.addColumn(spark, rt(path), name, ddlType))
      case AlterDropColRe(path, name) =>
        asDf(graft.storage.TxLog.dropColumn(spark, rt(path), name))
      case AlterColTypeRe(path, name, ddlType) =>
        asDf(graft.storage.TxLog.alterColumnType(spark, rt(path), name, ddlType))
      case OptimizeRe(path, parts, zcols) =>
        asDf(graft.storage.TxLog.compact(spark, rt(path),
          zorderBy = Option(zcols).toSeq
            .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
          partitions = Option(parts).toSeq
            .flatMap(_.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
              .filter(_.nonEmpty))))
      case TagRe(path, name, ver) =>
        asDf(graft.storage.TxLog.tag(spark, rt(path), name,
          Option(ver).map(_.toLong)))
      case UntagRe(path, name) =>
        graft.storage.TxLog.untag(spark, rt(path), name)
        Seq(name).toDF("untagged")
      case TagsRe(path) =>
        graft.storage.TxLog.tags(spark, rt(path)).toSeq.sortBy(_._1)
          .toDF("tag", "version")
      case ConvertRe(path, part, statsCols) =>
        asDf(graft.storage.TxLog.convert(spark, rt(path),
          partitionCols = Option(part).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
          statsCols = Option(statsCols).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)))
      case VacuumRe(path, keep, hours, dry) =>
        val files = graft.storage.TxLog.vacuum(spark, rt(path),
          keepVersions = Option(keep).map(_.toInt).getOrElse(1),
          dryRun = dry != null,
          keepHours = Option(hours).map(_.toDouble))
        // DRY RUN lists what WOULD go; the real vacuum reports a count
        if (dry != null) files.toDF("would_delete")
        else Seq(files.size.toLong).toDF("deleted_files")
      // a statement that CLAIMS to be a TXLOG verb but parses as none
      // must fail loudly here — falling through to spark.sql would
      // surface a baffling ANSI-parser error for what is really a
      // typo in a TXLOG statement
      case txlog if txlog.trim.toUpperCase.startsWith("TXLOG") =>
        throw new IllegalArgumentException(
          "Sql.exec: unrecognized TXLOG statement; supported verbs:\n" +
            "  TXLOG CREATE [OR REPLACE] '<path>' [PARTITION BY <col>] AS <select>\n" +
            "  TXLOG APPEND INTO '<path>' <select>\n" +
            "  TXLOG COPY INTO '<path>' FROM '<dir>' [FORMAT PARQUET|JSONL] [PATTERN '<glob>'] [FORCE] [MERGESCHEMA]\n" +
            "  TXLOG APPLY CHANGES INTO '<path>' ON k1[,k2...] <select of a CDF feed>\n" +
            "  TXLOG APPLY CHANGES INTO '<path>' <select of an EVENT feed> (keyless multiset apply)\n" +
            "  TXLOG MERGE INTO '<path>' ON <k1[,k2...]> USING <select>\n" +
            "  TXLOG DELETE FROM '<path>' WHERE <condition>\n" +
            "  TXLOG REPLACE INTO '<path>' PARTITIONS (<v1[,v2...]>) <select>\n" +
            "  TXLOG REPLACE INTO '<path>' WHERE (<predicate>) <select>\n" +
            "  TXLOG RESTORE '<path>' TO VERSION <n> | TO TIMESTAMP '<ts>'\n" +
            "  TXLOG CLONE '<src>' TO '<dst>' [DEEP] [VERSION <n>]\n" +
            "  TXLOG ALTER '<path>' ADD CONSTRAINT <name> CHECK (<expr>)\n" +
            "  TXLOG ALTER '<path>' ADD CONSTRAINT <name> UNIQUE (<k1[,k2...]>)\n" +
            "  TXLOG ALTER '<path>' DROP CONSTRAINT <name>\n" +
            "  TXLOG ALTER '<path>' RENAME COLUMN <old> TO <new>\n" +
            "  TXLOG ALTER '<path>' ADD COLUMN <name> <type>\n" +
            "  TXLOG ALTER '<path>' DROP COLUMN <name>\n" +
            "  TXLOG ALTER '<path>' ALTER COLUMN <name> TYPE <type>\n" +
            "  TXLOG ALTER '<path>' SET STATS COLS (<c1[,c2...]>)\n" +
            "  TXLOG ALTER '<path>' SET TBLPROPERTIES ('k'='v'[, ...])\n" +
            "  TXLOG ALTER '<path>' UNSET TBLPROPERTIES ('k'[, ...])\n" +
            "  TXLOG PROPERTIES '<path>'\n" +
            "  TXLOG OPTIMIZE '<path>' [PARTITIONS (<v1[,v2...]>)] [ZORDER BY <c1>[, <c2>, ...]]\n" +
            "  TXLOG VACUUM '<path>' [RETAIN <n> VERSIONS] [DRY RUN]\n" +
            "  TXLOG TXN BEGIN; <dml>; <dml>[; ...]; COMMIT " +
            "(atomic-outcome multi-table transaction)")
      case plain => spark.sql(plain)
    }
  }

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view (lazy — no scan happens
    * until a query runs, and queries prune/push down through views
    * exactly as through the DataFrame API). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      Tables.table(spark, sfDir, t) // schema check: fail fast if missing
      (t match {
        case "events" => Tables.events(spark, sfDir) // ns→µs ts shim
        case _ => Tables.table(spark, sfDir, t)
      }).createOrReplaceTempView(t)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.error("usage: Sql <sfDir> <sql...>"))
    val sql = args.drop(1).mkString(" ")
    val spark = GraftSession.get("graft-sql")
    registerAll(spark, sfDir)
    if (sql.nonEmpty) exec(spark, sql).show(100, truncate = false)
    else tableNames.foreach(t => println(s"view: $t"))
    spark.stop()
  }
}
