package graft.run

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame

import graft.plans.ScanGuard

/** Session-level scan-budget enforcement (D185 made AMBIENT for the
  * pipeline runner): `ScanGuard.assertBounded` is opt-in per call, but a
  * 100 TB deployment wants the budget on EVERY query the pipeline runs —
  * an unpruned ad-hoc query (typo'd column, cast defeating pushdown,
  * stale sidecar) must refuse BEFORE a task launches, not after the
  * bill.
  *
  * Budgets are configuration, scoped to where they belong:
  *  - [[setDefaultUnder]] puts a per-SCAN budget on every table under a
  *    lake root (deployments set it once on the warehouse directory);
  *  - [[setFor]] overrides one table (the fact table legitimately scans
  *    TBs; its dimension neighbors never should).
  *
  * Enforcement reads the OPTIMIZED plan's file listings (plan-time
  * metadata only — zero jobs, and partition pruning is credited, see
  * [[ScanGuard.scans]]); each scan checks against ITS table's budget —
  * the per-table override first, else the longest matching root default.
  * Unbudgeted paths pass untouched, so the rail costs nothing until
  * configured. The pipeline surfaces ([[TablePipeline.extract]]/
  * `transformWithStatus`, [[GroupScheduler.submit]]) all route through
  * [[enforce]]. */
object ScanBudget {

  private val byRoot =
    scala.collection.concurrent.TrieMap[String, Long]()
  private val byTable =
    scala.collection.concurrent.TrieMap[String, Long]()

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** Per-scan budget for every table under `root` (longest matching
    * root wins when roots nest). */
  def setDefaultUnder(root: String, maxBytes: Long): Unit = {
    require(maxBytes > 0); byRoot.put(norm(root), maxBytes); ()
  }

  /** Per-table override — beats any root default. */
  def setFor(path: String, maxBytes: Long): Unit = {
    require(maxBytes > 0); byTable.put(norm(path), maxBytes); ()
  }

  def clearUnder(root: String): Unit = {
    val r = norm(root)
    byRoot.remove(r)
    byTable.keys.filter(_.startsWith(r)).foreach(byTable.remove)
  }

  /** The budget governing one scan path, if any. */
  private[run] def budgetFor(path: String): Option[Long] = {
    val p = norm(path)
    byTable.get(p).orElse(
      byRoot.keys.toSeq.filter(r => p.startsWith(r + "/") || p == r)
        .sortBy(-_.length).headOption.flatMap(byRoot.get))
  }

  /** Refuse (naming the scan) when any budgeted scan in `df`'s optimized
    * plan exceeds its budget; return the total planned bytes otherwise.
    * Plan-time only — nothing has executed on failure. */
  def enforce(df: DataFrame): Long = {
    val ss = ScanGuard.scans(df)
    ss.foreach { s =>
      budgetFor(s.path).foreach { b =>
        if (s.bytes > b)
          throw new ScanGuard.ScanBudgetExceeded(
            s"scan of ${s.path} would read ${s.bytes} bytes in " +
              s"${s.files} files (budget $b) — refusing before execution")
      }
    }
    ss.map(_.bytes).sum
  }
}
