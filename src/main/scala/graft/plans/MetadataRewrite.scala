package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sink.{MetadataAgg, Sidecars}

/** Transparent metadata-only aggregate answering (SURVEY §2D, D234) —
  * the optimizer face of the D227/D107 planes: a GLOBAL
  * `count(*)` / `min` / `max` aggregate over a whole-table scan of a
  * table that DECLARES the counts/stats sidecars ([[Sidecars]]) is
  * rewritten to a [[LocalRelation]] holding the sidecar's answer —
  * zero Spark jobs at execution (a `LocalTableScan` collects on the
  * driver), the way Delta/Iceberg serve `SELECT count(*)` from the
  * transaction log. D227's explicit [[MetadataAgg]] API keeps working;
  * this rule lets the USER'S OWN QUERY take the metadata path without
  * knowing the planes exist — the D164 MvRewrite pattern applied to
  * the sidecar family.
  *
  * Stand-down contract (identical to the explicit API, because it IS
  * the explicit API underneath): every answer is inventory-validated —
  * a foreign file, a stale sidecar, an undeclared plane, a filter under
  * the aggregate, a grouped aggregate, a non-stats column, or ANY
  * aggregate in the list the planes cannot serve leaves the plan
  * untouched and the full scan answers. Partial rewrites never happen:
  * all-or-nothing per Aggregate node, so a query mixing `count(*)`
  * with `sum(x)` scans once instead of scanning AND folding.
  *
  * Scope (deliberately narrow — a rewrite must be exactly equivalent):
  * ungrouped `count(1)` (non-distinct) via the counts plane, and
  * `min`/`max` of the declared LONG stats column via the D107 ranges.
  * Both reproduce the scan bit-for-bit: counts are exact per-file
  * footer sums, and per-file min/max fold to the global extrema. */
object MetadataRewrite {
  def ensureInstalled(spark: SparkSession): Unit =
    RuleInstall.ensure(spark)(_.isInstanceOf[MetadataRewrite],
      new MetadataRewrite)
}

class MetadataRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      rewrite(agg).orElse(rewriteFilteredCount(agg)).getOrElse(agg)
    case agg: Aggregate => rewriteGrouped(agg).getOrElse(agg)
  }

  /** The whole-table scan under the aggregate — a bare relation or the
    * Project column pruning inserts; ANY other child (a Filter, a join)
    * disqualifies: the sidecars describe the unfiltered table only. */
  private def scanOf(child: LogicalPlan): Option[LogicalRelation] =
    child match {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] => Some(lr)
      case Project(projList, lr: LogicalRelation)
          if lr.relation.isInstanceOf[HadoopFsRelation] &&
            projList.forall(_.isInstanceOf[AttributeReference]) =>
        Some(lr)
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val lr = scanOf(agg.child).getOrElse(return None)
    val rel = lr.relation.asInstanceOf[HadoopFsRelation]
    val roots = rel.location.rootPaths
    if (roots.size != 1) return None
    val dir = roots.head.toUri.getPath
    // only DECLARED planes serve (the manifest is the opt-in; an
    // undeclared table never pays the listing) — and only the declared
    // stats column may answer min/max
    val planes = Sidecars.declared(dir)
    val hasCounts = planes.contains(Sidecars.Counts)
    val statsCols = planes.collect { case Sidecars.Stats(c) => c }.toSet
    if (!hasCounts && statsCols.isEmpty) return None

    // lazily answer each plane ONCE per Aggregate (count + min and max
    // share their folds); None anywhere = stale/missing → stand down
    lazy val countAnswer: Option[Long] =
      if (hasCounts) MetadataAgg.count(dir) else None
    val mmCache = scala.collection.mutable.Map[String, Option[(Long, Long)]]()
    def minMaxOf(c: String): Option[(Long, Long)] =
      mmCache.getOrElseUpdate(c,
        if (statsCols.contains(c)) MetadataAgg.minMax(dir, c) else None)

    // the 4th slot is the aggregate's FILTER clause: anything but None
    // means `count(*) FILTER (WHERE ...)` — the sidecars cannot serve it
    def serve(ae: AggregateExpression): Option[Long] = ae match {
      case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false,
          None, _) => countAnswer
      case AggregateExpression(Min(a: AttributeReference), Complete, false,
          None, _) if a.dataType == LongType => minMaxOf(a.name).map(_._1)
      case AggregateExpression(Max(a: AttributeReference), Complete, false,
          None, _) if a.dataType == LongType => minMaxOf(a.name).map(_._2)
      case _ => None
    }
    val values: Seq[Long] = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) =>
        serve(ae).getOrElse(return None)
      case ae: AggregateExpression => serve(ae).getOrElse(return None)
      case _ => return None
    }
    // the answer, under the aggregate's EXACT output attributes (ids,
    // names, types) so parents never see the substitution
    Some(LocalRelation(agg.aggregateExpressions.map(_.toAttribute),
      Seq(InternalRow(values: _*))))
  }

  /** The root dir of a single-root whole-table scan, or None. */
  private def dirOf(child: LogicalPlan): Option[String] =
    scanOf(child).flatMap { lr =>
      val roots = lr.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths
      if (roots.size == 1) Some(roots.head.toUri.getPath) else None
    }

  private def isCount1(ae: AggregateExpression): Boolean = ae match {
    // filter slot None: a FILTER-clause count is NOT a plain count(1)
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false,
        None, _) => true
    case _ => false
  }

  /** `count(*) WHERE histCol = 'v'` over a declared D236 histogram
    * plane: the one filtered shape a per-value histogram answers
    * exactly. The Filter may sit under/over the pruning Project. */
  private def rewriteFilteredCount(agg: Aggregate): Option[LogicalPlan] = {
    def stripProject(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripProject(c)
      case other => other
    }
    val (cond, below) = stripProject(agg.child) match {
      case Filter(c, ch) => (c, ch)
      case _ => return None
    }
    val dir = dirOf(stripProject(below)).getOrElse(return None)
    // the optimizer rewrites `g = 'v'` to `isnotnull(g) AND g = 'v'`
    // (null-intolerance inference): accept exactly one string equality
    // plus any IsNotNull conjuncts on the SAME attribute (redundant
    // under the equality — dropping them changes nothing)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val cs = conjuncts(cond)
    val eqs = cs.collect {
      case eq @ EqualTo(a: AttributeReference,
          Literal(v: UTF8String, StringType)) => (eq, a, v.toString)
      case eq @ EqualTo(Literal(v: UTF8String, StringType),
          a: AttributeReference) => (eq, a, v.toString)
    }
    if (eqs.size != 1) return None
    val (eqExpr, attr, value) = eqs.head
    val colName = attr.name
    // every OTHER conjunct must be the redundant inferred IsNotNull on
    // the SAME attribute — any further predicate (another equality, a
    // range, a null-tolerant expression) stands the rewrite down: the
    // histogram cannot see it, so serving would overcount
    val othersOk = cs.forall { c =>
      (c eq eqExpr) || (c match {
        case IsNotNull(a: AttributeReference) => a.semanticEquals(attr)
        case _ => false
      })
    }
    if (!othersOk) return None
    if (!Sidecars.declared(dir).exists {
      case Sidecars.Hist(c, _) => c == colName; case _ => false
    }) return None
    val n = MetadataAgg.countWhere(dir, colName, value)
      .getOrElse(return None) // stale → stand down
    val values: Seq[Long] = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) if isCount1(ae) => n
      case ae: AggregateExpression if isCount1(ae) => n
      case _ => return None
    }
    Some(LocalRelation(agg.aggregateExpressions.map(_.toAttribute),
      Seq(InternalRow(values: _*))))
  }

  /** `GROUP BY c` + `count(1)` served from metadata: `c` is either a
    * declared D236 histogram column (one LocalRelation row per value,
    * the NULL group included — the histogram tracks it, exactly as
    * GROUP BY does), or — D240 — the FIRST partition column of a
    * Counts-declared partitioned layout, served from the per-partition
    * file counts (the `SHOW PARTITIONS`-priced answer). Partition
    * values stand down when any first-level dir name carries a
    * percent-escape (Spark's escapePathName dialect — decoding it here
    * would re-implement a private format; narrow beats wrong);
    * `__HIVE_DEFAULT_PARTITION__` reads back as the NULL group, as the
    * scan does. */
  private def rewriteGrouped(agg: Aggregate): Option[LogicalPlan] = {
    val lr = scanOf(agg.child).getOrElse(return None)
    val rel = lr.relation.asInstanceOf[HadoopFsRelation]
    val dir = {
      val roots = rel.location.rootPaths
      if (roots.size != 1) return None
      roots.head.toUri.getPath
    }
    val groupAttr = agg.groupingExpressions match {
      case Seq(a: AttributeReference) if a.dataType == StringType => a
      case _ => return None
    }
    val planes = Sidecars.declared(dir)
    val fromHist = planes.exists {
      case Sidecars.Hist(c, _) => c == groupAttr.name; case _ => false
    }
    val fromPartitions = !fromHist && planes.contains(Sidecars.Counts) &&
      rel.partitionSchema.headOption.exists(_.name == groupAttr.name)
    val hist: Map[Option[String], Long] =
      if (fromHist)
        MetadataAgg.histCounts(dir, groupAttr.name)
          .getOrElse(return None) // stale → stand down
      else if (fromPartitions) {
        val parts = MetadataAgg.partitionCounts(dir)
          .getOrElse(return None)
        val prefix = groupAttr.name + "="
        // every first-level key must be THIS column's dir; any
        // percent-escaped value (or a stray root-level file) stands down
        if (!parts.keys.forall(k => k.startsWith(prefix) &&
            !k.contains('%'))) return None
        parts.map { case (k, n) =>
          val v = k.substring(prefix.length)
          (if (v == "__HIVE_DEFAULT_PARTITION__") None else Some(v)) -> n
        }
      } else return None
    // each output: the grouping attr (bare or aliased) | count(1)
    sealed trait Slot
    case object GroupSlot extends Slot
    case object CountSlot extends Slot
    val slots: Seq[Slot] = agg.aggregateExpressions.map {
      case a: AttributeReference if a.semanticEquals(groupAttr) => GroupSlot
      case Alias(a: AttributeReference, _)
          if a.semanticEquals(groupAttr) => GroupSlot
      case Alias(ae: AggregateExpression, _) if isCount1(ae) => CountSlot
      case ae: AggregateExpression if isCount1(ae) => CountSlot
      case _ => return None
    }
    val rows = hist.toSeq.sortBy(_._1.getOrElse("")).map { case (v, n) =>
      InternalRow(slots.map {
        case GroupSlot => v.map(UTF8String.fromString).orNull
        case CountSlot => n
      }: _*)
    }
    Some(LocalRelation(agg.aggregateExpressions.map(_.toAttribute), rows))
  }
}
