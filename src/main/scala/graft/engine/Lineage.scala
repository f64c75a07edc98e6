package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** Column-level lineage by Catalyst plan introspection: which SOURCE
  * columns feed each output column of a model — the impact-analysis layer
  * dbt's own catalog stops short of (its lineage is node-level; column
  * tools re-parse SQL text, while here the ANALYZED plan is the ground
  * truth, so expressions, joins, aggregates, windows, and explodes all
  * resolve exactly).
  *
  * Mechanics: every named expression's output attribute is mapped to the
  * union of its referenced attributes' provenance, folded bottom-up over
  * the plan; leaf attributes are matched to registered source DataFrames
  * by ExprId (the Registry hands models the SAME DataFrame objects, so
  * ids line up by construction). Filters/joins pass provenance through;
  * a self-joined source resolves both branches to the same source column
  * — the correct reading. Columns born from literals have empty lineage.
  */
object Lineage {

  /** Per-output-attribute provenance: ExprId -> contributing TERMINAL
    * ExprIds. Terminals are the registered sources' output attributes —
    * resolution STOPS there rather than descending into the source's own
    * projections (a source that casts its columns would otherwise hide
    * its public surface behind raw relation ids). Leaves stay terminal
    * for attributes no source claims.
    */
  private def provenance(plan: LogicalPlan,
      terminals: Set[ExprId]): Map[ExprId, Set[ExprId]] = {
    val fromChildren: Map[ExprId, Set[ExprId]] =
      plan.children.map(provenance(_, terminals))
        .foldLeft(Map.empty[ExprId, Set[ExprId]]) {
        (a, b) => a ++ b.map { case (k, v) => k -> (v ++ a.getOrElse(k, Set.empty)) }
      }
    def ofExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Set[ExprId] =
      e.references.toSeq.flatMap(a =>
        fromChildren.getOrElse(a.exprId, Set(a.exprId))).toSet
    def named(nes: Seq[NamedExpression]): Map[ExprId, Set[ExprId]] =
      nes.map {
        case a: Alias if terminals(a.exprId) => a.exprId -> Set(a.exprId)
        case a: Alias => a.exprId -> ofExpr(a.child)
        case attr: Attribute =>
          attr.exprId -> fromChildren.getOrElse(attr.exprId, Set(attr.exprId))
        case ne => ne.toAttribute.exprId -> ofExpr(ne)
      }.toMap
    plan match {
      case l: LeafNode => l.output.map(a => a.exprId -> Set(a.exprId)).toMap
      case p: Project => fromChildren ++ named(p.projectList)
      case a: Aggregate => fromChildren ++ named(a.aggregateExpressions)
      case w: Window => fromChildren ++ named(w.windowExpressions)
      case g: Generate =>
        // exploded columns descend from the generator's inputs
        fromChildren ++ g.generatorOutput.map(o =>
          o.exprId -> ofExpr(g.generator)).toMap
      case e: Expand =>
        fromChildren ++ e.output.zipWithIndex.map { case (o, i) =>
          o.exprId -> e.projections.flatMap(row => ofExpr(row(i))).toSet
        }.toMap
      case _ => fromChildren // Filter/Join/Union/SubqueryAlias pass through
    }
  }

  /** Lineage rows (out_column, src_relation, src_column) for `df`, with
    * sources identified by the DataFrames a Registry (or caller) supplies.
    * Output columns with no source contribution (pure literals) emit one
    * row with NULL source — absence would read as "column missing".
    */
  def columnLineage(spark: SparkSession, df: DataFrame,
      sources: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val leafToSource: Map[ExprId, (String, String)] = sources.flatMap {
      case (name, sdf) => sdf.queryExecution.analyzed.output.map(a =>
        a.exprId -> (name, a.name))
    }
    val plan = df.queryExecution.analyzed
    val prov = provenance(plan, leafToSource.keySet)
    val rows = plan.output.flatMap { out =>
      val srcs = prov.getOrElse(out.exprId, Set.empty)
        .flatMap(leafToSource.get).toSeq.sorted
      if (srcs.isEmpty) Seq((out.name, null: String, null: String))
      else srcs.map { case (rel, c) => (out.name, rel, c) }
    }
    rows.toDF("out_column", "src_relation", "src_column")
  }
}
