package graft.lake

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{CurrentNamespace, NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, Project, SetViewProperties, ShowCreateTable, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, StringType, StructType}

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
  * The same hook covers the rest of the DDL surface (VERDICT r10 #4):
  * `SHOW VIEWS [IN ns] [LIKE 'pat']`, `SHOW CREATE TABLE <view>` (Spark's
  * spelling of SHOW CREATE VIEW — the session catalog answers it for its
  * views the same way), and `ALTER VIEW ... AS / SET TBLPROPERTIES /
  * UNSET TBLPROPERTIES`.
  *
  * NAME-SHADOWING PRECEDENCE (pinned by ViewsSpec): a session TEMP view
  * always shadows a graft view of the same 1-part name — for reads
  * because the analyzer's own ResolveRelations substitutes temp views
  * earlier in the resolution batch than this extension's injected rule,
  * and for DDL because every rewrite below explicitly defers when
  * `isTempView` matches the name (exactly the session catalog's own
  * temp-before-persistent rule). Dropping the temp view un-shadows the
  * graft view.
  *
  * Enabled via `spark.sql.extensions=graft.lake.GraftSqlExtensions`
  * (SparkSpec/Verify/Bench all set it). Not covered (documented):
  * streaming reads of views. */
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

  /** Resolve a (possibly empty) multipart NAMESPACE to a graft catalog,
    * following the same rule: a first part naming a registered catalog
    * wins; empty parts mean the current catalog + current namespace. */
  def graftNamespace(session: SparkSession,
      parts: Seq[String]): Option[(String, GraftCatalog, Seq[String])] = {
    val cm = session.sessionState.catalogManager
    def catalogFor(name: String): Option[CatalogPlugin] =
      try Some(cm.catalog(name)) catch { case _: Exception => None }
    val (plugin, ns) =
      if (parts.isEmpty) (cm.currentCatalog, cm.currentNamespace.toSeq)
      else if (catalogFor(parts.head).isDefined)
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    plugin match {
      case g: GraftCatalog => Some((plugin.name(), g, ns))
      case _ => None
    }
  }

  /** The session catalog's temp-before-persistent precedence: a temp view
    * (local 1-part or global_temp 2-part) shadows a graft view of the
    * same name, so DDL naming one must stay with the delegate. */
  def isTempView(session: SparkSession, parts: Seq[String]): Boolean =
    session.sessionState.catalog.isTempView(parts)
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
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists)
        if !GraftViewSupport.isTempView(session, parts) =>
      GraftViewSupport.graftTarget(session, parts) match {
        case Some((cat, _, ident)) =>
          GraftDropViewCommand(cat, ident, ifExists)
        case None => plan
      }
    case sv @ ShowViews(child, pattern, _) =>
      val nsParts: Option[Seq[String]] = child match {
        case UnresolvedNamespace(parts, _) => Some(parts)
        case CurrentNamespace => Some(Seq.empty)
        case _ => None
      }
      nsParts.flatMap(GraftViewSupport.graftNamespace(session, _)) match {
        case Some((cat, _, ns)) => GraftShowViewsCommand(cat, ns, pattern)
        case None => plan
      }
    // SHOW CREATE TABLE is Spark's spelling of SHOW CREATE VIEW too (the
    // session catalog answers it for views); intercept only when the name
    // resolves to an EXISTING graft view, so graft TABLES keep Spark's
    // own DSv2 ShowCreateTableExec path untouched.
    case ShowCreateTable(UnresolvedTableOrView(parts, _, _), false, _)
        if !GraftViewSupport.isTempView(session, parts) =>
      GraftViewSupport.graftTarget(session, parts) match {
        case Some((cat, g, ident)) if g.viewExists(ident) =>
          GraftShowCreateViewCommand(cat, ident)
        case _ => plan
      }
    case AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _)
        if !GraftViewSupport.isTempView(session, parts) =>
      GraftViewSupport.graftTarget(session, parts) match {
        case Some((cat, _, ident)) =>
          GraftAlterViewAsCommand(cat, ident, originalText)
        case None => plan
      }
    case SetViewProperties(UnresolvedView(parts, _, _, _), props)
        if !GraftViewSupport.isTempView(session, parts) =>
      GraftViewSupport.graftTarget(session, parts) match {
        case Some((cat, _, ident)) =>
          GraftSetViewPropertiesCommand(cat, ident, props)
        case None => plan
      }
    case UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, ifExists)
        if !GraftViewSupport.isTempView(session, parts) =>
      GraftViewSupport.graftTarget(session, parts) match {
        case Some((cat, _, ident)) =>
          GraftUnsetViewPropertiesCommand(cat, ident, keys, ifExists)
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

/** `SHOW VIEWS [IN <graft-cat>[.<ns>]] [LIKE 'pattern']`: lists the
  * namespace's persistent views with the session catalog's output shape
  * (namespace, viewName, isTemporary). Pattern semantics are Spark's own
  * `StringUtils.filterPattern` ('*' wildcard, '|' alternation,
  * case-insensitive). Temp views are session-scoped, not catalog-scoped,
  * so they are never listed under a graft namespace. */
private[lake] final case class GraftShowViewsCommand(
    catalogName: String, ns: Seq[String],
    pattern: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val names = cat.listViews(ns: _*).map(_.name()).toSeq
    val filtered = pattern.fold(names)(StringUtils.filterPattern(names, _))
    filtered.sorted.map(n => Row(ns.mkString("."), n, false))
  }
}

/** `SHOW CREATE TABLE <graft-view>`: reconstructs runnable DDL from the
  * stored definition — aliases, comment, TBLPROPERTIES, query text. */
private[lake] final case class GraftShowCreateViewCommand(
    catalogName: String, ident: Identifier) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val v = cat.loadView(ident)
    def q(s: String) = "'" + s.replace("'", "\\'") + "'"
    val name = (Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
      .map(p => s"`$p`").mkString(".")
    val cols =
      if (v.columnAliases() == null || v.columnAliases().isEmpty) ""
      else v.columnAliases().map(a => s"`$a`").mkString(" (", ", ", ")")
    import scala.jdk.CollectionConverters._
    val props = v.properties().asScala.toSeq.sortBy(_._1)
    val comment = props.collectFirst { case ("comment", c) =>
      s"\nCOMMENT ${q(c)}" }.getOrElse("")
    val tblProps = props.filterNot(_._1 == "comment") match {
      case Seq() => ""
      case ps => ps.map { case (k, vl) => s"${q(k)} = ${q(vl)}" }
        .mkString("\nTBLPROPERTIES (\n  ", ",\n  ", ")")
    }
    Seq(Row(s"CREATE VIEW $name$cols$comment$tblProps AS\n${v.query()}\n"))
  }
}

/** `ALTER VIEW <graft-view> AS <query>`: replaces the stored query and
  * schema; the new body is captured under the CURRENT resolution context
  * (like CREATE), column aliases reset (the session catalog's semantics —
  * ALTER ... AS takes the query's own output names), properties kept. */
private[lake] final case class GraftAlterViewAsCommand(
    catalogName: String, ident: Identifier,
    sqlText: String) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val cm = session.sessionState.catalogManager
    val cat = cm.catalog(catalogName).asInstanceOf[GraftCatalog]
    if (!cat.viewExists(ident)) throw new NoSuchViewException(ident)
    val querySchema = session.sql(sqlText).schema
    val info = new ViewInfo(ident, sqlText, cm.currentCatalog.name(),
      cm.currentNamespace, querySchema, querySchema.fieldNames,
      Array.empty, Array.empty, cat.loadView(ident).properties())
    cat.replaceView(info, orCreate = false)
    Seq.empty
  }
}

/** `ALTER VIEW <graft-view> SET TBLPROPERTIES (...)`. */
private[lake] final case class GraftSetViewPropertiesCommand(
    catalogName: String, ident: Identifier,
    props: Map[String, String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    cat.alterView(ident, props.toSeq.map { case (k, v) =>
      ViewChange.setProperty(k, v) }: _*)
    Seq.empty
  }
}

/** `ALTER VIEW <graft-view> UNSET TBLPROPERTIES [IF EXISTS] (...)`:
  * missing keys are ignored either way — Spark 4 removed the legacy
  * UNSET_NONEXISTENT_PROPERTIES failure (the session catalog treats
  * every UNSET as IF EXISTS), and this command matches that contract.
  * The view itself must exist (alterView throws NoSuchViewException). */
private[lake] final case class GraftUnsetViewPropertiesCommand(
    catalogName: String, ident: Identifier, keys: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    cat.alterView(ident, keys.map(ViewChange.removeProperty): _*)
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
