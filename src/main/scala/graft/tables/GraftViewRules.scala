package graft.tables

import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.{Row, SparkSession}

/** Persistent views in the graft catalog — the reference's own
  * `CREATE VIEW` shape (R/postgres_process.Rmd:137,
  * `ukbb_gwas_results_export`), served for a V2 catalog that OSS
  * Spark's analyzer refuses views for (`ResolveSessionCatalog` throws
  * MISSING_CATALOG_ABILITY.VIEWS for every non-session catalog, ViewCatalog
  * implementation or not). This rule therefore runs in the HINTS batch
  * — before the Resolution batch where that refusal lives — and
  * rewrites the view plans onto [[GraftCatalog]]'s `ViewCatalog`
  * implementation:
  *
  *  - `CREATE [OR REPLACE] VIEW graft.v AS SELECT ...` → a command
  *    that analyzes the body once (for the declared schema) and
  *    persists the ORIGINAL SQL text in the registry file — the view
  *    survives the session, exactly like a table name;
  *  - `DROP VIEW graft.v` / `SHOW VIEWS IN graft` → registry ops;
  *  - a READ of `graft.v` splices the parsed body under a
  *    `SubqueryAlias`, so the whole query re-analyzes against the
  *    CURRENT head of the underlying tables and plans onto the same
  *    V1 parquet mount as a table read — pushdown, pruning and
  *    codegen apply through the view exactly as without it. Nested
  *    views expand recursively with cycle detection. The view's
  *    schema therefore EVOLVES with its body (SQL text binding) —
  *    the stored schema is the declaration-time snapshot, kept for
  *    DESCRIBE fidelity, never enforced against the body.
  */
case class GraftViewRules(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftCatalog(name: String): Option[GraftCatalog] =
    // conf guard first: this probe runs for every relation of every
    // query (2-part names like `db.table` would otherwise pay a
    // CatalogNotFoundException per reference on the analysis hot path)
    if (!spark.conf.getOption(s"spark.sql.catalog.$name")
        .contains(classOf[GraftCatalog].getName)) None
    else try spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** [cat, v] or [cat, "default", v] where `cat` is a graft catalog. */
  private def target(parts: Seq[String]): Option[(String, GraftCatalog, String)] =
    parts match {
      case Seq(cat, v) => graftCatalog(cat).map((cat, _, v))
      case Seq(cat, "default", v) => graftCatalog(cat).map((cat, _, v))
      case _ => None
    }

  private def isView(g: GraftCatalog, v: String): Boolean =
    g.viewExists(Identifier.of(Array.empty, v))

  /** Parse + splice a view body, expanding nested graft views with an
    * explicit ancestor chain — a cycle fails loudly instead of
    * spinning the analyzer's fixed point. A stored column list applies
    * as positional aliases over the body (the `FROM (q) t(a, b)`
    * analyzer node), so `CREATE VIEW v(a, b) AS SELECT ...` renames
    * exactly like a subquery alias would. */
  private def expand(cat: String, g: GraftCatalog, name: String,
                     chain: Set[String]): LogicalPlan = {
    require(!chain.contains(name),
      s"graft: cyclic view reference through '$name' " +
        s"(chain: ${chain.mkString(" -> ")})")
    val v = g.loadView(Identifier.of(Array.empty, name))
    val parsed = spark.sessionState.sqlParser.parsePlan(v.query())
    val expanded = parsed.transformDown {
      case u: UnresolvedRelation =>
        target(u.multipartIdentifier) match {
          case Some((c2, g2, v2)) if isView(g2, v2) =>
            expand(c2, g2, v2, chain + name)
          case _ => u
        }
    }
    val aliased =
      if (v.columnAliases().isEmpty) expanded
      else org.apache.spark.sql.catalyst.analysis
        .UnresolvedSubqueryColumnAliases(v.columnAliases().toSeq, expanded)
    SubqueryAlias(name, aliased)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case c: CreateView =>
        c.child match {
          case UnresolvedIdentifier(parts, _) =>
            target(parts) match {
              case Some((cat, g, v)) =>
                require(c.userSpecifiedColumns.forall(_._2.isEmpty),
                  s"graft.$v: column COMMENTs in a CREATE VIEW column " +
                    "list are not supported")
                val sql = c.originalText.getOrElse(
                  throw new IllegalArgumentException(
                    s"graft.$v: CREATE VIEW without SQL text"))
                GraftCreateViewCommand(cat, g, v, sql, c.query,
                  c.userSpecifiedColumns.map(_._1),
                  c.allowExisting, c.replace)
              case None => c
            }
          case _ => c
        }

      case d: DropView =>
        d.child match {
          case UnresolvedIdentifier(parts, _) =>
            target(parts) match {
              case Some((_, g, v)) => GraftDropViewCommand(g, v, d.ifExists)
              case None => d
            }
          case _ => d
        }

      // ALTER VIEW graft.v AS SELECT ... — a redefinition of an
      // EXISTING view (refuses on a missing name, unlike CREATE OR
      // REPLACE); the column list resets to the new body's own names
      case a: org.apache.spark.sql.catalyst.plans.logical.AlterViewAs =>
        a.child match {
          case uv: org.apache.spark.sql.catalyst.analysis.UnresolvedView
              if target(uv.multipartIdentifier).isDefined =>
            val (cat, g, v) = target(uv.multipartIdentifier).get
            if (!isView(g, v))
              throw new NoSuchViewException(
                Identifier.of(Array.empty, v))
            GraftCreateViewCommand(cat, g, v, a.originalText, a.query,
              Nil, allowExisting = false, replace = true)
          case _ => a
        }

      case s: ShowViews =>
        s.namespace match {
          case org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(parts, _)
              if parts.nonEmpty && graftCatalog(parts.head).isDefined &&
                (parts.lengthIs == 1 || parts == Seq(parts.head, "default")) =>
            GraftShowViewsCommand(parts.head,
              graftCatalog(parts.head).get, s.pattern, s.output)
          case _ => s
        }

      // DESCRIBE graft.v — a view is not a table, so the table path
      // would refuse; serve the stored declaration-time schema (and,
      // EXTENDED, the stored SQL text)
      case d: org.apache.spark.sql.catalyst.plans.logical.DescribeRelation =>
        d.relation match {
          case tv: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView
              if target(tv.multipartIdentifier)
                .exists { case (_, g, v) => isView(g, v) } =>
            val (_, g, v) = target(tv.multipartIdentifier).get
            GraftDescribeViewCommand(g, v, d.isExtended, d.output)
          case _ => d
        }

      case u: UnresolvedRelation if !u.isStreaming =>
        target(u.multipartIdentifier) match {
          case Some((cat, g, v)) if isView(g, v) =>
            expand(cat, g, v, Set.empty)
          case _ => u
        }
    }
}

/** DESCRIBE [EXTENDED] graft.v — the stored declaration-time schema
  * (the body re-analyzes at read, so a widened table surfaces there;
  * this is the declared contract), plus the SQL text when EXTENDED. */
case class GraftDescribeViewCommand(catalog: GraftCatalog, viewName: String,
                                    isExtended: Boolean,
                                    override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(Identifier.of(Array.empty, viewName))
    val cols = v.schema().fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Name", viewName, ""),
      Row("Type", "VIEW", ""),
      Row("View Text", v.query(), ""))
  }
}

/** CREATE [OR REPLACE] VIEW graft.v [(a, b, ...)] AS ... — analyzes
  * the body once (for the declared schema and the alias-arity gate),
  * persists the SQL text + column list in the registry. */
case class GraftCreateViewCommand(catalogName: String, catalog: GraftCatalog,
                                  viewName: String, sql: String,
                                  query: LogicalPlan,
                                  columnAliases: Seq[String],
                                  allowExisting: Boolean,
                                  replace: Boolean)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val ident = Identifier.of(Array.empty, viewName)
    if (!replace && catalog.viewExists(ident)) {
      if (allowExisting) return Nil
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    }
    // analyze the body (through this session's rules, so nested graft
    // names resolve) — the declaration-time schema snapshot
    val analyzed = ExprBridge.ofRows(spark, query)
    require(columnAliases.isEmpty ||
        columnAliases.size == analyzed.schema.size,
      s"graft.$viewName: the column list names ${columnAliases.size} " +
        s"columns but the body produces ${analyzed.schema.size}")
    val declared =
      if (columnAliases.isEmpty) analyzed.schema
      else org.apache.spark.sql.types.StructType(
        analyzed.schema.fields.zip(columnAliases).map { case (f, a) =>
          f.copy(name = a) })
    val info = new ViewInfo(ident, sql, catalogName, Array("default"),
      declared, analyzed.schema.fieldNames,
      columnAliases.toArray, Array.empty[String],
      java.util.Collections.emptyMap[String, String]())
    if (replace) catalog.replaceView(info, orCreate = true)
    else catalog.createView(info)
    Nil
  }
}

/** DROP VIEW [IF EXISTS] graft.v. */
case class GraftDropViewCommand(catalog: GraftCatalog, viewName: String,
                                ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val existed = catalog.dropView(Identifier.of(Array.empty, viewName))
    if (!existed && !ifExists)
      throw new NoSuchViewException(Identifier.of(Array.empty, viewName))
    Nil
  }
}

/** SHOW VIEWS IN graft [LIKE 'pattern'] — registry listing. */
case class GraftShowViewsCommand(catalogName: String, catalog: GraftCatalog,
                                 pattern: Option[String],
                                 override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // SHOW-pattern grammar, not raw regex: '*' = any sequence, '|' =
    // alternation, everything else LITERAL (quoted — 'a.b' must not
    // match 'aXb', 'my+view' must not throw)
    val re = pattern.map { p =>
      ("(?i)^(" + p.split("\\|").map(alt =>
        alt.split("\\*", -1).map {
          case "" => ""
          case lit => java.util.regex.Pattern.quote(lit)
        }.mkString(".*")).mkString("|") + ")$").r
    }
    catalog.listViews().map(_.name).toSeq.sorted
      .filter(n => re.forall(_.findFirstIn(n).isDefined))
      .map(n => Row(catalogName, n, false))
  }
}
