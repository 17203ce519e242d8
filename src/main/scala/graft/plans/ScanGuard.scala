package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Scan budget guard (SURVEY §2D, D185) — the governance rail for the
  * 100 TB footgun: an ad-hoc query whose predicate did NOT prune (typo'd
  * column, cast defeating pushdown, stale sidecar standing down) will
  * happily scan the whole table; on a laptop that's slow, at 100 TB it's
  * a five-figure bill. [[check]] inspects the OPTIMIZED plan — after
  * every pruning rule (partition pruning, D142/D183 sidecar rules) has
  * had its say — and totals the bytes each file scan will actually
  * read; [[assertBounded]] refuses to execute past the budget, naming
  * the offending scans and their sizes, BEFORE a single task launches.
  *
  * This is plan-time metadata only (the file index sizes Spark already
  * holds) — zero jobs, zero scans; the same numbers the Spark UI would
  * show after the money is spent, read before. Column pruning is
  * deliberately not credited (bytes are file-level) — the guard is a
  * ceiling, not an estimator, and a columnar projection under budget
  * passes because its FILES are under budget after row-group pruning's
  * coarser unit. */
object ScanGuard {

  final case class Scan(path: String, files: Int, bytes: Long)

  /** Every file scan in the optimized plan with its listed size.
    *
    * For PATH-BASED hive-layout reads the logical FileIndex still lists
    * every partition (pruning happens at physical planning), so the
    * walk carries each scan's enclosing Filter conjuncts down and hands
    * the partition-column ones to `listFiles` — crediting exactly the
    * partitions the physical scan will skip, no more (a non-partition
    * or non-deterministic conjunct prunes nothing here). */
  def scans(df: DataFrame): Seq[Scan] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def walk(plan: LogicalPlan, filters: Seq[Expression]): Seq[Scan] =
      plan match {
        case Filter(cond, child) => walk(child, filters ++ conjuncts(cond))
        case Project(_, child) => walk(child, filters)
        case lr: LogicalRelation
            if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val rel = lr.relation.asInstanceOf[HadoopFsRelation]
          val partCols = rel.partitionSchema.fieldNames.toSet
          val partFilters = filters.filter { f =>
            f.deterministic && f.references.nonEmpty &&
              f.references.forall(a => lr.outputSet.contains(a) &&
                partCols.contains(a.name))
          }
          val sizes = rel.location.listFiles(partFilters, Nil)
            .flatMap(_.files.map(_.getLen))
          Seq(Scan(rel.location.rootPaths.map(_.toUri.getPath).mkString(","),
            sizes.size, sizes.sum))
        case other => other.children.flatMap(walk(_, Nil))
      }
    walk(df.queryExecution.optimizedPlan, Nil)
  }

  final class ScanBudgetExceeded(msg: String) extends RuntimeException(msg)

  /** Total bytes the plan's scans will read. */
  def plannedBytes(df: DataFrame): Long = scans(df).map(_.bytes).sum

  /** Throw [[ScanBudgetExceeded]] (naming every scan and its size) when
    * the plan reads more than `maxBytes`; return the planned bytes
    * otherwise. Call at submission boundaries (notebook harnesses, the
    * pipeline runner) — nothing executes on failure. */
  def assertBounded(df: DataFrame, maxBytes: Long): Long = {
    val ss = scans(df)
    val total = ss.map(_.bytes).sum
    if (total > maxBytes)
      throw new ScanBudgetExceeded(
        s"plan would scan $total bytes (budget $maxBytes):\n" +
          ss.sortBy(-_.bytes).map(s =>
            s"  ${s.bytes} bytes in ${s.files} files  ${s.path}")
            .mkString("\n"))
    total
  }
}
