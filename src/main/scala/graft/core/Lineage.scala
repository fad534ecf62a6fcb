package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Generate, LogicalPlan, Project, Union, Window => LWindow}
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

  /** exprId.id → set of (table, column) leaves the attribute derives from.
    *
    * Attribute-CREATING nodes each get an explicit case (ADVICE r11: a
    * node that mints exprIds but is not handled here would silently drop
    * its columns from the report):
    * Project/Aggregate/Window aliases, Union (per-position union of the
    * children's lineage — Spark reuses the first child's exprIds for the
    * union output, so the explicit entry OVERRIDES the first-child-only
    * mapping the fold would leave), Generate (generator outputs derive
    * from the generator's references), Expand (per-position union over
    * the projections). Intersect/Except never reach the walk — the
    * optimizer rewrites them to semi/anti joins, whose attributes pass
    * through. Leaves WITHOUT a file source (LocalRelation literals/grids,
    * LogicalRDD checkpoint barriers) contribute nothing by design: data
    * lineage maps SOURCE-derived values, and a column fed only by
    * constants has no source edge. */
  private def walk(p: LogicalPlan): Map[Long, Set[(String, String)]] = p match {
    case lr: LogicalRelation =>
      val t = tableName(lr)
      lr.output.map(a => a.exprId.id -> Set((t, a.name))).toMap
    case u: Union =>
      val cms = u.children.map(walk)
      val merged =
        cms.foldLeft(Map.empty[Long, Set[(String, String)]])(_ ++ _)
      val added = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId.id -> u.children.zip(cms).flatMap { case (c, cm) =>
          cm.getOrElse(c.output(i).exprId.id, Set.empty[(String, String)])
        }.toSet
      }
      merged ++ added
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
        case g: Generate =>
          val gd = deps(g.generator)
          g.generatorOutput.map(a => a.exprId.id -> gd)
        case e: Expand =>
          e.output.zipWithIndex.map { case (a, i) =>
            a.exprId.id -> e.projections.flatMap(pr => deps(pr(i))).toSet
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
