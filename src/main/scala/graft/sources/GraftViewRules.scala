package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** ANALYZER RULES that make [[GraftCatalog]]'s `ViewCatalog` reachable
  * from SQL. Spark 4.1 ships the DSv2 `ViewCatalog` API but no engine
  * wiring — view DDL against a V2 catalog dies in
  * `ResolveSessionCatalog` with MISSING_CATALOG_ABILITY, and a view
  * reference never resolves. The production answer (the one Iceberg
  * ships for exactly this gap) is injected analyzer rules; ours run in
  * the HINTS batch (`injectHintResolutionRule`), which precedes the
  * Resolution batch entirely — the built-in error path can never fire
  * because the view plans it objects to are already rewritten:
  *
  *  - [[RewriteGraftViewCommands]] lowers the view DDL plans
  *    (CREATE/DROP/SHOW/ALTER/RENAME) whose UNRESOLVED identifier
  *    names a [[GraftCatalog]] into leaf runnable commands over the
  *    catalog's `ViewCatalog` methods. CREATE defers analysis of its
  *    SELECT to execution (the stored artifact is the SQL TEXT; the
  *    one-off analysis there also yields the schema/output names the
  *    `ViewInfo` records).
  *  - [[ResolveGraftViews]] expands a relation reference that names a
  *    stored view into its parsed SQL text — relative table names
  *    re-qualified against the view's CREATE-time catalog/namespace,
  *    user column aliases applied, CTEs substituted (that batch
  *    already ran for the outer plan), nested views expanded
  *    recursively with an explicit cycle check.
  *
  * Registered by [[graft.plans.GraftExtensions]]. Expansion-based
  * views add zero data-path cost: the expanded plan is exactly what
  * the user would have typed, so pushdown/pruning/time-travel all
  * compose unchanged. */
private[graft] class ResolveGraftViews(session: SparkSession)
  extends Rule[LogicalPlan] {

  private def catalogs = session.sessionState.catalogManager

  /** (catalog, identifier) when `parts` names a view in a graft
    * catalog: `cat.ns….name` with `cat` a registered GraftCatalog. */
  private def asGraftView(parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    if (parts.length < 2 || !catalogs.isCatalogRegistered(parts.head)) None
    else catalogs.catalog(parts.head) match {
      case g: GraftCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        if (g.viewExists(ident)) Some((g, ident)) else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUpWithSubqueriesAndPruning(_ => true) {
      case u @ UnresolvedRelation(parts, _, false) =>
        asGraftView(parts).fold(u: LogicalPlan) { case (g, ident) =>
          expand(g, parts.head, ident,
            Set(s"${parts.head}.${ident.toString}"))
        }
    }

  /** The stored text, parsed and re-qualified; nested view references
    * expand inline so one pass sees the whole tree (and so a view
    * cycle is OUR error, not a fixpoint timeout). */
  private def expand(g: GraftCatalog, catName: String, ident: Identifier,
      seen: Set[String]): LogicalPlan = {
    val v = g.loadView(ident)
    val parsed = session.sessionState.sqlParser.parsePlan(v.query)
    // CTE substitution FIRST (the outer plan's Substitution batch
    // already ran, so a WITH clause inside the view text must be
    // substituted here) — and before qualification, which would
    // otherwise catalog-qualify a CTE reference out of existence
    val substituted = CTESubstitution.apply(parsed)
    val qualified = substituted.transformUpWithSubqueries {
      case r @ UnresolvedRelation(parts, opts, stream) =>
        val full: Seq[String] =
          if (catalogs.isCatalogRegistered(parts.head)) parts
          else if (parts.length == 1)
            (v.currentCatalog() +: v.currentNamespace().toSeq) ++ parts
          else v.currentCatalog() +: parts
        asGraftView(full) match {
          case Some((g2, inner)) if !stream =>
            val key = s"${full.head}.${inner.toString}"
            if (seen.contains(key)) throw new IllegalStateException(
              s"cyclic view reference: ${seen.mkString(" -> ")} -> $key")
            expand(g2, full.head, inner, seen + key)
          case _ =>
            if (full eq parts) r else UnresolvedRelation(full, opts, stream)
        }
    }
    // user-specified column list renames the query's output positions
    val aliased =
      if (v.columnAliases() == null || v.columnAliases().isEmpty) qualified
      else Project(v.queryColumnNames().zip(v.columnAliases()).toSeq.map {
        case (q, a) => Alias(UnresolvedAttribute.quoted(q), a)()
      }, qualified)
    SubqueryAlias(Seq(catName) ++ ident.namespace() :+ ident.name(), aliased)
  }
}

/** Lowers view DDL onto [[GraftCatalog]]'s ViewCatalog methods (see
  * [[ResolveGraftViews]] for why these rules exist at all). Matches
  * the UNRESOLVED identifier forms — in the Hints batch nothing has
  * resolved yet, which is exactly what keeps the built-in
  * "catalog does not support views" path unreachable. */
private[graft] class RewriteGraftViewCommands(session: SparkSession)
  extends Rule[LogicalPlan] {

  private def catalogs = session.sessionState.catalogManager

  /** The graft catalog a DDL identifier targets, if any. */
  private def graftTarget(parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    if (parts.length < 2 || !catalogs.isCatalogRegistered(parts.head)) None
    else catalogs.catalog(parts.head) match {
      case g: GraftCatalog =>
        Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
      case _ => None
    }

  /** Like [[graftTarget]] but only when a stored view EXISTS — ALTER/
    * RENAME must not hijack table DDL on the same catalog. */
  private def graftView(parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    graftTarget(parts).filter { case (g, id) => g.viewExists(id) }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
          props, originalText, query, allowExisting, replace, _)
          if graftTarget(parts).isDefined =>
        val (g, ident) = graftTarget(parts).get
        val text = originalText.getOrElse(throw new IllegalStateException(
          s"CREATE VIEW $ident: no SQL text to store"))
        CreateGraftViewCommand(g, ident, text,
          catalogs.currentCatalog.name(), catalogs.currentNamespace,
          query, cols.map(_._1), cols.map(_._2.orNull),
          props ++ comment.map("comment" -> _),
          allowExisting, replace)

      case DropView(UnresolvedIdentifier(parts, _), ifExists)
          if graftTarget(parts).isDefined =>
        val (g, ident) = graftTarget(parts).get
        DropGraftViewCommand(g, ident, ifExists)

      case ShowViews(UnresolvedNamespace(parts, _), pattern, out)
          if parts.nonEmpty && catalogs.isCatalogRegistered(parts.head) &&
            catalogs.catalog(parts.head).isInstanceOf[GraftCatalog] =>
        ShowGraftViewsCommand(
          catalogs.catalog(parts.head).asInstanceOf[GraftCatalog],
          parts.tail, pattern, out)

      case SetViewProperties(UnresolvedView(parts, _, _, _), props)
          if graftView(parts).isDefined =>
        val (g, ident) = graftView(parts).get
        AlterGraftViewCommand(g, ident,
          props.toSeq.map { case (k, vl) => ViewChange.setProperty(k, vl) })

      case UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _)
          if graftView(parts).isDefined =>
        val (g, ident) = graftView(parts).get
        AlterGraftViewCommand(g, ident, keys.map(ViewChange.removeProperty))

      case RenameTable(UnresolvedTableOrView(parts, _, _), newName, true)
          if graftView(parts).isDefined =>
        val (g, ident) = graftView(parts).get
        val target =
          if (newName.length >= 2 && catalogs.isCatalogRegistered(newName.head))
            Identifier.of(newName.tail.init.toArray, newName.last)
          else Identifier.of(newName.init.toArray, newName.last)
        RenameGraftViewCommand(g, ident, target)
    }
}

private[graft] case class CreateGraftViewCommand(
    catalog: GraftCatalog, ident: Identifier, sql: String,
    currentCatalog: String, currentNamespace: Array[String],
    query: LogicalPlan, columnAliases: Seq[String],
    columnComments: Seq[String], properties: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  // the raw SELECT rides along for the one-off analysis below; it is
  // NOT a child, so the command itself is trivially resolved
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    // analyze the view text once at CREATE: records the schema/output
    // names in the ViewInfo and rejects an invalid SELECT eagerly
    // (resolution includes ResolveGraftViews, so views-on-views work)
    val analyzed = spark.sessionState.executePlan(query).analyzed
    if (columnAliases.nonEmpty &&
        columnAliases.length != analyzed.output.length)
      throw new IllegalArgumentException(
        s"CREATE VIEW $ident: ${columnAliases.length} column names for " +
          s"${analyzed.output.length} query columns")
    val info = new ViewInfo(ident, sql, currentCatalog, currentNamespace,
      analyzed.schema, analyzed.output.map(_.name).toArray,
      columnAliases.toArray, columnComments.toArray, properties.asJava)
    if (replace) catalog.replaceView(info, true)
    else if (allowExisting && catalog.viewExists(ident)) ()
    else catalog.createView(info)
    Nil
  }
}

private[graft] case class DropGraftViewCommand(
    catalog: GraftCatalog, ident: Identifier, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Nil
  }
}

private[graft] case class ShowGraftViewsCommand(
    catalog: GraftCatalog, namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val ids = catalog.listViews(namespace: _*).toSeq
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name()), p).nonEmpty))
    ids.sortBy(_.name()).map(id =>
      Row(id.namespace().mkString("."), id.name(), false))
  }
}

private[graft] case class AlterGraftViewCommand(
    catalog: GraftCatalog, ident: Identifier, changes: Seq[ViewChange])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Nil
  }
}

private[graft] case class RenameGraftViewCommand(
    catalog: GraftCatalog, from: Identifier, to: Identifier)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Nil
  }
}
