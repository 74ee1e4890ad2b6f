package graft.lake

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL surface for GraftCatalog's persistent views (VERDICT r9 #7).
  *
  * Spark 4.1.2 ships the DSv2 `ViewCatalog` interface but wires NO SQL to
  * it: `ResolveSessionCatalog` throws `MISSING_CATALOG_ABILITY.VIEWS` for
  * `CREATE VIEW` against any non-session catalog (even one implementing
  * ViewCatalog — ResolveSessionCatalog.scala:469), and no analyzer rule
  * resolves a SELECT through `loadView`. Rather than wait upstream, this
  * extension lights the surface up itself — the same public
  * `SparkSessionExtensions` route Iceberg's Spark integration uses:
  *
  *  - a PARSER hook rewrites `CREATE [OR REPLACE] VIEW` / `DROP VIEW`
  *    whose target lives in a GraftCatalog into runnable commands that
  *    call the catalog's existing create/replace/dropView. A parser hook,
  *    not a resolution rule, because injected resolution rules run AFTER
  *    ResolveSessionCatalog inside the fixed-point batch — it throws
  *    before an injected rule ever sees the plan.
  *  - a RESOLUTION rule substitutes any `UnresolvedRelation` naming a
  *    graft view with its stored query text, re-parsed and re-qualified
  *    under the CREATE-time catalog+namespace context (relative names in
  *    the body keep meaning what they meant at creation), with the
  *    user's column aliases applied by stored query-column name. Nested
  *    views substitute on subsequent fixed-point iterations; a cyclic
  *    view fails the analyzer's iteration cap loudly.
  *
  * Enabled via `spark.sql.extensions=graft.lake.GraftSqlExtensions`
  * (SparkSpec/Verify/Bench all set it). Not covered (documented): SHOW
  * VIEWS / SHOW CREATE VIEW SQL (the `listViews` API works), ALTER VIEW,
  * and streaming reads of views. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) => new GraftViewParser(session, delegate))
    ext.injectResolutionRule(session => new ResolveGraftViews(session))
  }
}

private[lake] object GraftViewSupport {
  /** Resolve a multipart name to (catalogName, GraftCatalog, ident) when
    * — and only when — it targets a graft catalog, following Spark's own
    * rule: a first part naming a registered catalog wins; otherwise the
    * current catalog + current namespace complete the name. */
  def graftTarget(session: SparkSession,
      parts: Seq[String]): Option[(String, GraftCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    def catalogFor(name: String): Option[CatalogPlugin] =
      try Some(cm.catalog(name)) catch { case _: Exception => None }
    val (plugin, ident) =
      if (parts.length > 1 && catalogFor(parts.head).isDefined)
        (cm.catalog(parts.head),
          Identifier.of(parts.tail.init.toArray, parts.last))
      else if (parts.length == 1)
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, parts.head))
      else
        (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
    plugin match {
      case g: GraftCatalog => Some((plugin.name(), g, ident))
      case _ => None
    }
  }
}

/** Delegating parser that intercepts view DDL aimed at a GraftCatalog.
  * Everything else — including CREATE TEMPORARY VIEW and session-catalog
  * views, which parse to different plans — passes through untouched. */
private[lake] class GraftViewParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView => cv.child match {
      case UnresolvedIdentifier(parts, _) =>
        GraftViewSupport.graftTarget(session, parts) match {
          case Some((cat, _, ident)) =>
            GraftCreateViewCommand(cat, ident,
              cv.userSpecifiedColumns, cv.comment, cv.properties,
              cv.originalText, cv.allowExisting, cv.replace)
          case None => plan
        }
      case _ => plan
    }
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      GraftViewSupport.graftTarget(session, parts) match {
        case Some((cat, _, ident)) =>
          GraftDropViewCommand(cat, ident, ifExists)
        case None => plan
      }
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW <graft-cat>.<ns>.<v> [(aliases)] AS <query>`:
  * analyzes the body under the CURRENT resolution context (that context
  * is what the view stores and later re-resolves under) and delegates to
  * the ViewCatalog implementation. */
private[lake] final case class GraftCreateViewCommand(
    catalogName: String,
    ident: Identifier,
    userColumns: Seq[(String, Option[String])],
    comment: Option[String],
    properties: Map[String, String],
    originalText: Option[String],
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val sqlText = originalText.getOrElse(throw new IllegalArgumentException(
      s"CREATE VIEW $catalogName.$ident has no query text"))
    val cm = session.sessionState.catalogManager
    val cat = cm.catalog(catalogName).asInstanceOf[GraftCatalog]
    if (!replace && allowExisting && cat.viewExists(ident)) return Seq.empty
    val querySchema = session.sql(sqlText).schema
    if (userColumns.nonEmpty && userColumns.length != querySchema.length)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "CREATE_VIEW_COLUMN_ARITY_MISMATCH.NOT_ENOUGH_DATA_COLUMNS",
        messageParameters = Map(
          "viewName" -> s"$catalogName.$ident",
          "viewColumns" -> userColumns.map(_._1).mkString(", "),
          "dataColumns" -> querySchema.fieldNames.mkString(", ")))
    // the view's schema carries the user aliases; queryColumnNames keep
    // the body's own output names for positional re-aliasing at read time
    val viewSchema =
      if (userColumns.isEmpty) querySchema
      else StructType(querySchema.fields.zip(userColumns).map {
        case (f, (alias, _)) => f.copy(name = alias)
      })
    import scala.jdk.CollectionConverters._
    val props = (properties ++ comment.map("comment" -> _)).asJava
    val info = new ViewInfo(ident, sqlText, cm.currentCatalog.name(),
      cm.currentNamespace, viewSchema,
      querySchema.fieldNames,
      userColumns.map(_._1).toArray,
      userColumns.map(_._2.orNull).toArray,
      props)
    if (replace) cat.replaceView(info, orCreate = true)
    else cat.createView(info)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] <graft-cat>.<ns>.<v>`. */
private[lake] final case class GraftDropViewCommand(
    catalogName: String, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    if (!cat.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Seq.empty
  }
}

/** Substitutes `UnresolvedRelation`s naming graft views with their stored
  * query, re-qualified under the CREATE-time context. Runs inside the
  * analyzer's resolution fixed point, so nested views unfold iteration by
  * iteration. */
private[lake] class ResolveGraftViews(session: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, false) =>
        GraftViewSupport.graftTarget(session, parts) match {
          case Some((cat, g, ident)) if g.viewExists(ident) =>
            substitute(cat, g, ident)
          case _ => u
        }
    }

  private def substitute(catalogName: String, cat: GraftCatalog,
      ident: Identifier): LogicalPlan = {
    val view = cat.loadView(ident)
    val parsed = session.sessionState.sqlParser.parsePlan(view.query)
    // re-qualify the body's relative names under the CREATE-time context:
    // 1-part → ctx catalog + ctx namespace, 2-part → ctx catalog
    val ctxCat = view.currentCatalog
    val ctxNs = view.currentNamespace.toSeq
    val qualified = parsed.transformUp {
      case r @ UnresolvedRelation(ps, _, _) if ps.length < 3 =>
        val full =
          if (ps.length == 1) ctxCat +: ctxNs :+ ps.head
          else ctxCat +: ps
        UnresolvedRelation(full, r.options, r.isStreaming)
    }
    // positional column aliases by the stored query-output names
    val aliased =
      if (view.columnAliases == null || view.columnAliases.isEmpty) qualified
      else Project(
        view.queryColumnNames.toSeq.zip(view.columnAliases.toSeq).map {
          case (q, a) => Alias(UnresolvedAttribute.quoted(q), a)()
        }, qualified)
    SubqueryAlias(Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name(),
      aliased)
  }
}
