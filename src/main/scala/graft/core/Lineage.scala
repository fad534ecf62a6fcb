package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window => LWindow}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE extraction from a Catalyst plan — the data-catalog
  * observability every governed lakehouse maintains ("which source columns
  * feed this report column?"): each output attribute of a query's OPTIMIZED
  * logical plan maps transitively to the (source table, source column)
  * leaves its VALUE derives from. This is DATA lineage — Alias/aggregate/
  * window expressions traced through their references; join keys and filter
  * predicates are CONTROL dependencies and deliberately excluded (the
  * standard catalog distinction, e.g. OpenLineage's).
  *
  * Reading the OPTIMIZED plan (not the analyzed one) means the lineage
  * reflects what the engine actually reads after column pruning — a pruned
  * column never appears, which is exactly what a cost/GDPR audit wants.
  *
  * Pure plan metadata: no job runs, no data moves — the same class of
  * driver-side introspection as `core/Meta.layout`'s footer read.
  */
object Lineage {

  private def tableName(lr: LogicalRelation): String = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("<unknown>")
    case _ => "<unknown>"
  }

  /** exprId.id → set of (table, column) leaves the attribute derives from. */
  private def walk(p: LogicalPlan): Map[Long, Set[(String, String)]] = p match {
    case lr: LogicalRelation =>
      val t = tableName(lr)
      lr.output.map(a => a.exprId.id -> Set((t, a.name))).toMap
    case _ =>
      val cm = p.children.map(walk)
        .foldLeft(Map.empty[Long, Set[(String, String)]])(_ ++ _)
      def deps(e: Expression): Set[(String, String)] =
        e.references.toSeq
          .flatMap(a => cm.getOrElse(a.exprId.id, Set.empty[(String, String)]))
          .toSet
      val added: Seq[(Long, Set[(String, String)])] = p match {
        case pj: Project =>
          pj.projectList.collect { case a: Alias => a.exprId.id -> deps(a.child) }
        case ag: Aggregate =>
          ag.aggregateExpressions.collect {
            case a: Alias => a.exprId.id -> deps(a.child)
          }
        case w: LWindow =>
          w.windowExpressions.collect {
            case a: Alias => a.exprId.id -> deps(a.child)
          }
        case _ => Seq.empty
      }
      cm ++ added
  }

  /** (out_col, src_table, src_col) triples for every output column of the
    * frame's optimized plan, sorted. */
  def of(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.optimizedPlan
    val m = walk(plan)
    plan.output.flatMap { a =>
      m.getOrElse(a.exprId.id, Set.empty[(String, String)]).toSeq
        .map { case (t, c) => (a.name, t, c) }
    }.sorted
  }
}
