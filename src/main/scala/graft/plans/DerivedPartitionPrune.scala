package graft.plans

import java.nio.file.Paths

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.LongType

import graft.sink.StageWriter

/** Optimizer rule: DERIVED-partition pruning — Delta's generated-column
  * partition pruning on the plain-parquet fallback. A table written with
  * [[StageWriter.writeDerivedPartitioned]] is partitioned by a column
  * COMPUTED from a source column (`part = src div N`, e.g. day from a
  * nanosecond timestamp) and records that derivation in a `_derived_
  * partition` sidecar. Readers naturally filter on the SOURCE column
  * (`ts BETWEEN a AND b`) — which alone prunes nothing, because the
  * partition column never appears in the predicate. This rule reads the
  * sidecar and injects the implied partition conjunct
  * (`part ∈ [a div N, b div N]`), which Spark's file-source strategy
  * then turns into directory-level pruning at listing time.
  *
  * Fail-safe by construction: no sidecar, a sidecar naming a column that
  * is not actually a partition column, an unbounded predicate, or a
  * negative lower bound (integer `div` truncates toward zero, so the
  * floor identity needs a non-negative domain) each disable the rewrite
  * — and the injected conjunct is IMPLIED by the original filter, which
  * always remains, so a wrong stand-down costs listing, never rows.
  * Idempotent: once the partition column is constrained, the rule skips
  * (its own output included). */
class DerivedPartitionPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] =>
      rewrite(cond, lr, lr.relation.asInstanceOf[HadoopFsRelation])
        .getOrElse(f)
  }

  private def rewrite(cond: Expression, lr: LogicalRelation,
      rel: HadoopFsRelation): Option[Filter] = {
    val roots = rel.location.rootPaths
    if (roots.size != 1) return None
    val dir = roots.head.toUri.getPath
    if (!java.nio.file.Files.isDirectory(Paths.get(dir))) return None
    val (partCol, srcCol, div) =
      StageWriter.derivedPartitionSpec(dir).getOrElse(return None)
    if (div <= 0) return None
    if (!rel.partitionSchema.fieldNames.contains(partCol)) return None
    // already constrained (including by this rule's own rewrite) → skip
    if (StatsFilePrune.extractBounds(cond, partCol).isDefined) return None
    val (lo, hi) = StatsFilePrune.extractBounds(cond, srcCol)
      .getOrElse(return None)
    // `div` truncates toward zero; the floor identity used below only
    // holds for a non-negative domain — require a usable lower bound
    if (lo == Long.MinValue || lo < 0) return None
    val attr = lr.output.find(_.name == partCol).getOrElse(return None)
    // partition values surface as strings when type inference is off —
    // cast once; partition pruning evaluates this per-directory
    val castAttr = Cast(attr, LongType)
    val lower = GreaterThanOrEqual(castAttr, Literal(lo / div))
    val derived = if (hi == Long.MaxValue || hi < lo) lower
      else And(lower, LessThanOrEqual(castAttr, Literal(hi / div)))
    Some(Filter(And(cond, derived), lr))
  }
}

object DerivedPartitionPrune {

  /** Idempotent permanent install — the [[StatsFilePrune.ensureInstalled]]
    * lifecycle, through the SHARED [[RuleInstall]] lock (per-companion
    * locks lose concurrent installs on the session-global list). */
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit =
    RuleInstall.ensure(spark)(_.isInstanceOf[DerivedPartitionPrune],
      new DerivedPartitionPrune)
}
