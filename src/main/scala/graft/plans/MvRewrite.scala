package graft.plans

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.DecimalType

import graft.sink.StageWriter

/** Materialized-view registry + automatic aggregate rewrite (SURVEY §2D,
  * D164) — the lakehouse MV feature: a query that aggregates the 100 TB
  * base table is transparently answered from its KB-scale rollup
  * ([[graft.operators.Rollup.build]] artifact) whenever the rollup
  * subsumes it, the way warehouse optimizers (and Delta/BigQuery MVs)
  * rewrite against materialized aggregates. The user keeps writing
  * queries against the BASE path; maintenance (Rollup.merge /
  * applyChanges) and answering decouple.
  *
  * Subsumption contract (deliberately narrow — a rewrite must be
  * EXACTLY equivalent, never approximately):
  *
  *  - the scan is the registered base path (flat parquet, one root);
  *  - every grouping expression is a bare column ⊆ the MV's keys;
  *  - every aggregate is `sum(CAST(value AS DECIMAL(18,2)))` or
  *    `count(1)` on the MV's value column — the engine-wide
  *    exact-arithmetic shape [[graft.operators.Rollup.build]] persists.
  *    Both re-aggregate losslessly from (n, s) partials: decimal sums
  *    are associative (no IEEE reorder drift) and counts add.
  *
  * Freshness: registration fingerprints the base directory's file
  * inventory (names + sizes — the log-size class, a driver-side listing,
  * never a scan); the rule re-lists at plan time and STANDS DOWN on any
  * mismatch, so a base the MV hasn't caught up with is answered from the
  * base itself — stale answers are impossible by construction, the
  * trade Delta makes by checking MV staleness in the optimizer.
  *
  * The rewritten Aggregate preserves the original output attribute ids
  * and types (grouping attrs re-aliased under their exprIds; the decimal
  * re-sum cast back to the original Sum's type), so parent operators
  * never see the substitution. */
object MvRewrite {

  /** A registered rollup. `kind` selects the artifact dialect:
    * "sum" — `mvPath` holds Rollup.build(base, keys, value), columns
    * (keys..., n, s), serving sum/count/avg; "minmax" — mvPath holds
    * Rollup.buildMinMax, columns (keys..., mn, mx), serving min/max. */
  final case class Mv(basePath: String, mvPath: String, keys: Seq[String],
      valueCol: String, fingerprint: String, kind: String = "sum")

  // base path → (mv path → Mv): a base can carry SEVERAL rollups at
  // different granularities (the D182 cascade registers fine AND coarse);
  // the rule picks the COARSEST subsumer — fewest keys = smallest scan
  private val registry =
    scala.collection.concurrent.TrieMap[String, Map[String, Mv]]()

  /** Names + sizes of the visible data files — the same inventory-exact
    * validity contract as the stats sidecar. */
  private[plans] def fingerprint(dir: String): String =
    StageWriter.listDataFiles(Paths.get(dir))
      .map(p => s"${p.getFileName}:${java.nio.file.Files.size(p)}")
      .mkString("\n")

  /** Register (or refresh) an MV for `basePath`. Call AFTER the rollup
    * is (re)built so the fingerprint matches the state it summarizes. */
  def register(basePath: String, mvPath: String, keys: Seq[String],
      valueCol: String): Unit = registerKind(basePath, mvPath, keys,
    valueCol, "sum")

  /** Register a [[graft.operators.Rollup.buildMinMax]] artifact
    * (keys..., mn, mx) to serve min/max groupings (D184's plane made
    * query-facing): min/max re-aggregate losslessly from per-group
    * extrema in ANY type — no decimal bridge needed. Freshness is the
    * same inventory fingerprint (a retraction rewrites files, so a
    * stale minmax MV stands down like any other). */
  def registerMinMax(basePath: String, mvPath: String, keys: Seq[String],
      valueCol: String): Unit = registerKind(basePath, mvPath, keys,
    valueCol, "minmax")

  private def registerKind(basePath: String, mvPath: String,
      keys: Seq[String], valueCol: String, kind: String): Unit =
    synchronized {
      val norm = Paths.get(basePath).toAbsolutePath.toString
      val mv = Mv(norm, mvPath, keys, valueCol, fingerprint(norm), kind)
      registry.put(norm,
        registry.getOrElse(norm, Map.empty) + (mvPath -> mv))
      ()
    }

  /** Drop every MV registered for `basePath`. */
  def deregister(basePath: String): Unit = synchronized {
    registry.remove(Paths.get(basePath).toAbsolutePath.toString); ()
  }

  /** Drop ONE MV of a base (several can share a base — a cascade's
    * levels, or siblings on one versioned-table snapshot dir). */
  def deregister(basePath: String, mvPath: String): Unit = synchronized {
    val norm = Paths.get(basePath).toAbsolutePath.toString
    registry.get(norm).foreach { m =>
      val rest = m - mvPath
      if (rest.isEmpty) registry.remove(norm) else registry.put(norm, rest)
    }
    ()
  }

  private[plans] def lookup(dir: String): Seq[Mv] =
    registry.get(Paths.get(dir).toAbsolutePath.toString)
      .map(_.values.toSeq).getOrElse(Seq.empty)

  def ensureInstalled(spark: SparkSession): Unit =
    RuleInstall.ensure(spark)(_.isInstanceOf[MvRewrite], new MvRewrite)
}

class MvRewrite extends Rule[LogicalPlan] {
  import MvRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** The base-table scan under the aggregate, tolerating the Project
    * column pruning inserts (extraOptimizations run after pruning). */
  private def scanOf(child: LogicalPlan): Option[LogicalRelation] =
    child match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some(lr)
      case Project(projList, lr: LogicalRelation)
          if lr.relation.isInstanceOf[HadoopFsRelation] &&
            projList.forall(_.isInstanceOf[AttributeReference]) =>
        Some(lr)
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[Aggregate] = {
    val lr = scanOf(agg.child).getOrElse(return None)
    val rel = lr.relation.asInstanceOf[HadoopFsRelation]
    val roots = rel.location.rootPaths
    if (roots.size != 1) return None
    val dir = roots.head.toUri.getPath
    val candidates = lookup(dir)
    if (candidates.isEmpty) return None
    // freshness: any divergence between the inventory an MV summarizes
    // and the directory NOW disqualifies it (never a stale answer).
    // Among the fresh subsumers, the COARSEST (fewest keys) wins — it is
    // the smallest rollup that can still answer exactly.
    candidates.filter(mv => fingerprint(mv.basePath) == mv.fingerprint)
      .sortBy(_.keys.size)
      .view.flatMap(mv => tryMv(agg, rel, mv)).headOption
  }

  // every aggregate pattern below requires the FILTER slot to be None:
  // `sum(x) FILTER (WHERE ...)` aggregates a SUBSET the rollup cannot
  // see — rewriting it would serve the unfiltered answer (r14 fix)
  private def tryMv(agg: Aggregate, rel: HadoopFsRelation,
      mv: Mv): Option[Aggregate] = {
    // every grouping expression: a bare key column of the MV
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if mv.keys.contains(a.name) => a.name
      case _ => return None
    }

    // the MV scan (tiny — rollup-domain-sized; no pruning needed)
    val spark = rel.sparkSession
    val mvPlan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
    val mvAttr: Map[String, Attribute] =
      mvPlan.output.map(a => a.name -> a).toMap
    val needed = if (mv.kind == "minmax") Seq("mn", "mx") else Seq("n", "s")
    if (!(groupNames ++ needed).forall(mvAttr.contains)) return None

    // the EXACT engine-wide shape only: Rollup.build persists
    // sum(cast(v AS DECIMAL(18,2))), so a cast to any OTHER decimal
    // precision/scale rounds per-row differently than the rollup did —
    // rewriting it would swap a differently-rounded sum in. Any
    // mismatched decimal stands down (answered from the base).
    def isValueSum(e: Expression): Boolean = e match {
      case Cast(a: AttributeReference, dt: DecimalType, _, _) =>
        a.name == mv.valueCol && dt == DecimalType(18, 2)
      case _ => false
    }
    def aggExpr(f: aggregate.AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    // re-express one aggregate over the MV's partials, cast back to
    // the original's result type so parents see an identical schema:
    // sum(cast(v)) → sum(s), count(1) → sum(n), avg(cast(v)) →
    // sum(s)/sum(n) in Average's own division shape, min/max(v) →
    // min(mn)/max(mx)
    def reagg(ae: AggregateExpression): Option[Expression] =
      if (mv.kind == "minmax") ae match {
        case AggregateExpression(Min(a: AttributeReference), Complete,
            false, None, _) if a.name == mv.valueCol =>
          Some(Cast(aggExpr(Min(mvAttr("mn"))), ae.dataType))
        case AggregateExpression(Max(a: AttributeReference), Complete,
            false, None, _) if a.name == mv.valueCol =>
          Some(Cast(aggExpr(Max(mvAttr("mx"))), ae.dataType))
        case _ => None
      } else ae match {
        case AggregateExpression(Sum(c, _), Complete, false, None, _)
            if isValueSum(c) =>
          Some(Cast(aggExpr(Sum(mvAttr("s"))), ae.dataType))
        case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false,
            None, _) =>
          // a GLOBAL count over an EMPTY rollup: sum(n) is NULL where
          // count(1) must be 0 — coalesce closes the value edge (grouped
          // counts never see it: no group row, no output row)
          Some(Cast(Coalesce(Seq(aggExpr(Sum(mvAttr("n"))), Literal(0L))),
            ae.dataType))
        case AggregateExpression(Average(c, em), Complete, false, None, _)
            if isValueSum(c) =>
          // Average over DECIMAL(18,2) finalizes as Divide(buffer sum
          // (28,2), count (20,0)) cast to (22,6); re-derive the SAME
          // division from the partials — Sum(s) folded back to the
          // (28,2) buffer type (identical overflow edge), Sum(n) as the
          // (20,0) count — so every intermediate type, rounding point
          // and the final cast match the un-rewritten aggregate bit for
          // bit. The Divide inherits the Average's OWN EvalMode, so an
          // ANSI session's error-on-overflow edge is served identically
          // too (a hardcoded LEGACY would silently return null where
          // the un-rewritten aggregate raises). IEEE double avg never
          // reaches here (isValueSum demands the exact decimal cast) —
          // sum order would drift it.
          val s28 = Cast(aggExpr(Sum(mvAttr("s"))), DecimalType(28, 2))
          val n20 = Cast(aggExpr(Sum(mvAttr("n"))), DecimalType(20, 0))
          Some(Cast(Divide(s28, n20, em), ae.dataType))
        case _ => None
      }
    // each output: grouping attr (bare or aliased) | re-expressible
    // aggregate, possibly under a collapsed projection Cast (the
    // optimizer folds `select(cast(s, double))` into the Aggregate)
    val newOutputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(
          exprId = a.exprId, explicitMetadata = Some(a.metadata))
      case al @ Alias(a: AttributeReference, _)
          if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), al.name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, _) =>
        Alias(reagg(ae).getOrElse(return None), al.name)(exprId = al.exprId)
      case al @ Alias(Cast(ae: AggregateExpression, dt, tz, ansi), _) =>
        Alias(Cast(reagg(ae).getOrElse(return None), dt, tz, ansi),
          al.name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Aggregate(groupNames.map(mvAttr(_)), newOutputs, mvPlan))
  }
}
