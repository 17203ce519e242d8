package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Column-level lineage extraction (SURVEY §2D, D195) — the impact-
  * analysis half of the warehouse documentation plane (D192 renders
  * what tables LOOK like; this answers "which SOURCE columns feed this
  * output column", the question every schema change and every privacy
  * review asks first).
  *
  * One bottom-up walk of the ANALYZED plan accumulates, per attribute
  * exprId, the set of (source table, source column) leaves it
  * transitively derives from: file scans seed their own columns,
  * Project/Aggregate/Window map each NEW attribute (Alias) to the union
  * of its referenced attributes' sets, Generate maps generator output
  * to the generator's references, Union merges positionally. Plain
  * attribute references pass through untouched (their exprId already
  * carries the right set — Catalyst's attribute identity does the
  * bookkeeping).
  *
  * This is VALUE lineage: join conditions and filters influence WHICH
  * rows flow but contribute no bytes to an output column, so they are
  * deliberately excluded (the standard OpenLineage/column-lineage
  * contract). Pure plan metadata — zero jobs. */
object Lineage {

  /** `outCol` of the frame derives from `srcTable`.`srcCol`. */
  final case class Edge(outCol: String, srcTable: String, srcCol: String)

  /** Lineage edges of `df`'s output columns, source tables named by
    * directory basename (stable across temp roots). Output columns with
    * NO source dependency (literals, count(1)) contribute no edges. */
  def of(df: DataFrame): Seq[Edge] =
    ofPaths(df).map { case (out, path, c) =>
      Edge(out,
        path.split('/').last.stripSuffix(".parquet"), c)
    }

  /** Every file scan of `df`'s ANALYZED plan, one entry PER
    * LogicalRelation instance (a self-join of a path contributes two
    * entries for it), subqueries included. The multiplicity is the
    * row-policy propagation safety signal: with two scans of a policied
    * path, an output row combines TWO source rows, and a predicate
    * rewritten onto one side's renamed columns leaves the other side's
    * contribution unfiltered — restricted values would leak through the
    * un-rewritten side. Pure plan metadata — zero jobs. */
  def scanPaths(df: DataFrame): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
      p match {
        case lr: LogicalRelation
            if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val roots = lr.relation.asInstanceOf[HadoopFsRelation]
            .location.rootPaths
          out += roots.headOption.map(_.toUri.getPath).getOrElse("?")
        case _ => ()
      }
    }
    walk(df.queryExecution.analyzed)
    out.toSeq
  }

  /** Output columns that are PURE 1:1 RENAMES of a scan column — the
    * value chain from output to leaf is Alias/AttributeReference only,
    * with no-op same-type Casts allowed (the transform engine casts
    * every column to its target type; string→string is identity). Any
    * computing node (function call, Aggregate, Window, Generate, Union,
    * Expand) breaks identity: a renamed-through column carries the
    * source column's VALUES unchanged, so a predicate over the source
    * column can be rewritten to the output name without changing its
    * meaning — the safety condition row-policy propagation (D193+D200)
    * rests on. Returns outCol → (srcPath, srcCol); outputs that are not
    * pure renames are absent. Pure plan metadata — zero jobs. */
  def renamesOf(df: DataFrame): Map[String, (String, String)] = {
    val ident =
      scala.collection.mutable.Map.empty[ExprId, (String, String)]
    def strip(e: Expression): Expression = e match {
      case c: Cast if c.child.dataType == c.dataType => strip(c.child)
      case other => other
    }
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case lr: LogicalRelation
            if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val roots = lr.relation.asInstanceOf[HadoopFsRelation]
            .location.rootPaths
          val table = roots.headOption
            .map(_.toUri.getPath).getOrElse("?")
          lr.output.foreach(a => ident(a.exprId) = (table, a.name))
        case pj: Project =>
          pj.projectList.foreach {
            case _: AttributeReference => () // passthrough: stays bound
            case al: Alias => strip(al.child) match {
              case ar: AttributeReference if ident.contains(ar.exprId) =>
                ident(al.exprId) = ident(ar.exprId)
              case _ => () // computed: not a rename
            }
            case _ => ()
          }
        // Union REUSES the first child's exprIds for its output while
        // the other branches contribute DIFFERENT values — unbind, or a
        // renamed column unioned with anything would falsely qualify.
        // Expand likewise re-emits child exprIds with grouping columns
        // NULLed per projection row.
        case u: Union => u.output.foreach(a => ident.remove(a.exprId))
        case e: Expand => e.output.foreach(a => ident.remove(a.exprId))
        // OUTER joins null-pad the non-preserved side: those columns'
        // per-row values are NOT the source values (a padded row holds
        // NULL where the source never did), so predicate rewriting over
        // them would change meaning — unbind the nullable side(s).
        // Inner/Cross/Semi/Anti only drop or keep whole rows.
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          import org.apache.spark.sql.catalyst.plans._
          j.joinType match {
            case Inner | Cross | LeftSemi | LeftAnti => ()
            case LeftOuter =>
              j.right.output.foreach(a => ident.remove(a.exprId))
            case RightOuter =>
              j.left.output.foreach(a => ident.remove(a.exprId))
            case _ => // FullOuter and anything exotic: fail safe
              j.output.foreach(a => ident.remove(a.exprId))
          }
        // every other node either passes attributes through with values
        // untouched (Filter/Join/Sort/Limit/Window/Generate child side —
        // identity preserved by exprId; row multiplicity may change but
        // per-row VALUES do not, which is the predicate-rewrite safety
        // condition) or mints new attributes that are never seeded
        // (Aggregate/Window expressions — correctly absent; an
        // Aggregate GROUPING key that passes through is constant within
        // its group, so its identity is genuine)
        case _ => ()
      }
    }
    val plan = df.queryExecution.analyzed
    walk(plan)
    plan.output.flatMap(a => ident.get(a.exprId).map(a.name -> _)).toMap
  }

  /** As [[of]], but sources keyed by their FULL scan path — the form
    * tag propagation (D196) joins against the governance registry. */
  def ofPaths(df: DataFrame): Seq[(String, String, String)] = {
    val deps =
      scala.collection.mutable.Map.empty[ExprId, Set[(String, String)]]
    def exprDeps(e: Expression): Set[(String, String)] =
      e.references.iterator
        .flatMap(a => deps.getOrElse(a.exprId, Set.empty)).toSet
    def bind(ne: NamedExpression): Unit = ne match {
      case _: AttributeReference => () // passthrough: set already bound
      case al: Alias => deps(al.exprId) = exprDeps(al.child)
      case other => deps(other.exprId) = exprDeps(other)
    }
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p.subqueries.foreach(walk) // IN/EXISTS/scalar subqueries seed too
      p match {
        case lr: LogicalRelation
            if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val roots = lr.relation.asInstanceOf[HadoopFsRelation]
            .location.rootPaths
          val table = roots.headOption
            .map(_.toUri.getPath).getOrElse("?")
          lr.output.foreach(a => deps(a.exprId) = Set((table, a.name)))
        case pj: Project => pj.projectList.foreach(bind)
        case ag: Aggregate => ag.aggregateExpressions.foreach(bind)
        case w: Window => w.windowExpressions.foreach(bind)
        case g: Generate =>
          val in = exprDeps(g.generator)
          g.generatorOutput.foreach(a => deps(a.exprId) = in)
        case u: Union =>
          u.output.zipWithIndex.foreach { case (a, i) =>
            deps(a.exprId) = u.children.iterator.flatMap(c =>
              deps.getOrElse(c.output(i).exprId, Set.empty)).toSet
          }
        case e: Expand =>
          e.output.zipWithIndex.foreach { case (a, i) =>
            deps(a.exprId) = e.projections.iterator
              .flatMap(row => exprDeps(row(i))).toSet
          }
        case _ => () // Filter/Join/Sort/Limit/alias nodes: passthrough
      }
    }
    val plan = df.queryExecution.analyzed
    walk(plan)
    plan.output.flatMap(a =>
      deps.getOrElse(a.exprId, Set.empty).toSeq.sorted
        .map { case (t, c) => (a.name, t, c) })
  }
}
