package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window => WindowNode}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE extraction from the analyzed Catalyst plan:
  * for every output column of a query, the set of (source table,
  * source column) leaves it transitively derives from — the
  * governance primitive under GDPR data maps, PII propagation audits,
  * and impact analysis ("which dashboards break if we drop
  * o_totalprice?"). Engines bolt this on as external parsers
  * (OpenLineage/Spline walk the same trees); here it is a direct
  * fold over the plan the optimizer itself uses, so expressions,
  * aliases, aggregates, windows, and joins are all resolved the same
  * way the execution is — no SQL re-parsing, no drift.
  *
  * The walk is a bottom-up fold: leaf file relations seed each
  * attribute with its (table, column) identity (table = the root
  * path's basename, the engine's identifier for pathed parquet);
  * Project/Aggregate/Window nodes map each defined NamedExpression to
  * the UNION of its referenced attributes' lineage (transitive
  * closure by construction — an alias of an alias resolves through);
  * every other node (Join, Filter, Sort, …) passes attributes
  * through unchanged. Metadata-plane only: the plan is driver-side,
  * O(plan size), nothing executes.
  */
object ColumnLineage {

  private def tableName(l: LogicalRelation): String = l.relation match {
    case fs: HadoopFsRelation =>
      val base = fs.location.rootPaths.headOption.map(_.getName).getOrElse("?")
      base.stripSuffix(".parquet")
    case _ => l.catalogTable.map(_.identifier.table).getOrElse("?")
  }

  private def defined(m: Map[ExprId, Set[(String, String)]],
      nes: Seq[NamedExpression]): Map[ExprId, Set[(String, String)]] =
    m ++ nes.map { ne =>
      ne.exprId -> ne.references.toSeq
        .flatMap(r => m.getOrElse(r.exprId, Set.empty[(String, String)])).toSet
    }

  private def walk(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    val fromChildren = plan.children.map(walk)
      .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
    plan match {
      case l: LogicalRelation =>
        val t = tableName(l)
        l.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case p: Project => defined(fromChildren, p.projectList)
      case a: Aggregate => defined(fromChildren, a.aggregateExpressions)
      case w: WindowNode => defined(fromChildren, w.windowExpressions)
      case _ => fromChildren
    }
  }

  /** One row per (output column, source table, source column) edge,
    * sorted; output columns with no table ancestry (pure literals,
    * count(*)) emit a single ('-', '-') row so the relation is total
    * over the query's schema.
    */
  def lineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.flatMap { a =>
      val srcs = m.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "-", "-"))
      else srcs.toSeq.map { case (t, c) => (a.name, t, c) }
    }.sorted
  }
}
