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
    try spark.sessionState.catalogManager.catalog(name) match {
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
    * spinning the analyzer's fixed point. */
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
    SubqueryAlias(name, expanded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case c: CreateView =>
        c.child match {
          case UnresolvedIdentifier(parts, _) =>
            target(parts) match {
              case Some((cat, g, v)) =>
                require(c.userSpecifiedColumns.isEmpty,
                  s"graft.$v: CREATE VIEW with a column list is not " +
                    "supported — alias the columns in the SELECT")
                val sql = c.originalText.getOrElse(
                  throw new IllegalArgumentException(
                    s"graft.$v: CREATE VIEW without SQL text"))
                GraftCreateViewCommand(cat, g, v, sql, c.query,
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

      case s: ShowViews =>
        s.namespace match {
          case org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(parts, _)
              if parts.nonEmpty && graftCatalog(parts.head).isDefined &&
                (parts.lengthIs == 1 || parts == Seq(parts.head, "default")) =>
            GraftShowViewsCommand(parts.head,
              graftCatalog(parts.head).get, s.pattern, s.output)
          case _ => s
        }

      case u: UnresolvedRelation if !u.isStreaming =>
        target(u.multipartIdentifier) match {
          case Some((cat, g, v)) if isView(g, v) =>
            expand(cat, g, v, Set.empty)
          case _ => u
        }
    }
}

/** CREATE [OR REPLACE] VIEW graft.v AS ... — analyzes the body once
  * for the declared schema, persists the SQL text in the registry. */
case class GraftCreateViewCommand(catalogName: String, catalog: GraftCatalog,
                                  viewName: String, sql: String,
                                  query: LogicalPlan, allowExisting: Boolean,
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
    val info = new ViewInfo(ident, sql, catalogName, Array("default"),
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String],
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
    val re = pattern.map(p =>
      ("(?i)^" + p.replace("*", ".*").replace("|", "|") + "$").r)
    catalog.listViews().map(_.name).toSeq.sorted
      .filter(n => re.forall(_.findFirstIn(n).isDefined))
      .map(n => Row(catalogName, n, false))
  }
}
