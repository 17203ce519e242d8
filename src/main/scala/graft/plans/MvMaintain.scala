package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.operators.Rollup
import graft.sink.{StageWriter, VersionedTable}

/** Self-maintaining materialized view (SURVEY §2D, D170): the composition
  * that turns D157/D165/D164 into the actual lakehouse MV lifecycle —
  * BUILD a rollup over a versioned table's head, REFRESH it from the
  * version CHANGE FEED (never a base rescan: `VersionedTable.diff` rows
  * through `Rollup.applyChanges`), and keep the [[MvRewrite]] registration
  * pointed at the snapshot the rollup provably summarizes.
  *
  * Registration targets the HEAD VERSION'S DATA DIRECTORY, and version
  * dirs are immutable — so the staleness story is structural: a new
  * source commit changes the scan path itself, queries over the new head
  * simply miss the registry (answered from the base, correct-but-slower)
  * until [[refresh]] catches the rollup up and re-registers. A stale MV
  * answer is impossible without even consulting a fingerprint (the
  * fingerprint check remains as defense in depth).
  *
  * Cost at 100 TB: build pays one base aggregation ONCE; every refresh
  * pays O(changed rows) + the rollup-domain merge; every subsuming query
  * pays a KB-scale rollup scan. */
object MvMaintain {

  final case class Refresh(fromV: Int, toV: Int, changeRows: Long)

  private def statePath(mvPath: String) = Paths.get(mvPath + ".__mvstate__")

  /** The version the rollup at `mvPath` currently summarizes. */
  def summarizedVersion(mvPath: String): Option[Int] = {
    val p = statePath(mvPath)
    if (!Files.isRegularFile(p)) None
    else scala.util.Try(
      Files.readAllLines(p).get(1).trim.toInt).toOption
  }

  /** The immutable data directory a versioned read scans — taken from the
    * plan itself (follows shallow-clone refs for free). */
  private def scanDir(spark: SparkSession, table: String, v: Int): String = {
    val plan = VersionedTable.read(spark, table, Some(v))
      .queryExecution.analyzed
    plan.collectLeaves().collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.head.toUri.getPath
    }.getOrElse(throw new IllegalStateException(
      s"$table v$v: no file scan to register the MV against"))
  }

  /** Full build at the source head; registers the rewrite. Returns the
    * summarized version. */
  def build(spark: SparkSession, srcTable: String, mvPath: String,
      keys: Seq[String], valueCol: String): Int = {
    val v = VersionedTable.latestVersion(srcTable).getOrElse(
      throw new IllegalStateException(s"no committed version at $srcTable"))
    val snap = VersionedTable.read(spark, srcTable, Some(v))
    StageWriter.overwrite(Rollup.build(snap, keys, valueCol), mvPath)
    Files.writeString(statePath(mvPath), s"$srcTable\n$v\n")
    MvRewrite.register(scanDir(spark, srcTable, v), mvPath, keys, valueCol)
    v
  }

  /** Re-register an existing MV after a DRIVER RESTART: the rewrite
    * registry is session memory, but the MV's state sidecar is durable —
    * a no-op refresh when the source hasn't moved, a real one when it
    * has, and either way the registration is re-pointed at the current
    * head it now summarizes. Losing the registry was never a correctness
    * hazard (queries fall back to the base), only a performance one;
    * this closes it. */
  def rehydrate(spark: SparkSession, mvPath: String, keys: Seq[String],
      valueCol: String): Refresh = {
    val p = statePath(mvPath)
    require(Files.isRegularFile(p), s"$mvPath: no MV state to rehydrate")
    val srcTable = Files.readAllLines(p).get(0).trim
    refresh(spark, srcTable, mvPath, keys, valueCol) match {
      case r @ Refresh(from, to, _) if from == to =>
        // refresh no-ops without re-registering — do it here
        MvRewrite.register(scanDir(spark, srcTable, to), mvPath, keys,
          valueCol)
        r
      case r => r
    }
  }

  /** Catch the rollup up from its summarized version to the source head
    * using the change feed — O(changed rows), never a base rescan — and
    * re-point the rewrite registration at the new head. No-op when
    * already current. */
  def refresh(spark: SparkSession, srcTable: String, mvPath: String,
      keys: Seq[String], valueCol: String): Refresh = {
    val fromV = summarizedVersion(mvPath).getOrElse(
      throw new IllegalStateException(
        s"$mvPath: no MV state — run build() first"))
    val toV = VersionedTable.latestVersion(srcTable).getOrElse(
      throw new IllegalStateException(s"no committed version at $srcTable"))
    if (toV == fromV) return Refresh(fromV, toV, 0L)
    require(toV > fromV,
      s"$srcTable head $toV is behind the summarized version $fromV")
    val changes = VersionedTable.diff(spark, srcTable, fromV, toV)
      .localCheckpoint() // the rollup overwrite below must not re-plan this
    val applied = changes.count()
    val maintained = Rollup.applyChanges(
      spark.read.parquet(mvPath), changes, keys, valueCol)
      .localCheckpoint() // materialize BEFORE overwriting what it reads
    // drop only THIS MV's registration (siblings on the same snapshot
    // dir — other granularities of a cascade — stay registered)
    MvRewrite.deregister(scanDir(spark, srcTable, fromV), mvPath)
    StageWriter.overwrite(maintained, mvPath)
    Files.writeString(statePath(mvPath), s"$srcTable\n$toV\n")
    MvRewrite.register(scanDir(spark, srcTable, toV), mvPath, keys, valueCol)
    Refresh(fromV, toV, applied)
  }
}
