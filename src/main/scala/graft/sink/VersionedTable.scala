package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned snapshots with time travel — the Parquet-fallback twin of
  * Delta's `versionAsOf` / table history (the reference writes Delta,
  * `artifacts/aws-glue/code/stage/light_transform.py:1363-1409`).
  *
  * Layout: `table/v=N/` data directories (append-only) + a `table/_latest`
  * pointer file naming the committed version. A commit WRITES the new
  * version directory first and REPOINTS `_latest` last via a single-file
  * atomic rename — the Delta-log insight (commit = atomic pointer flip)
  * applied minimally:
  *
  *  - readers always see a complete snapshot (a crash mid-write strands an
  *    unreferenced `v=N+1` dir; `_latest` still names `v=N`) — this closes
  *    the delete-then-move atomicity gap StageWriter.overwrite documents;
  *  - old versions stay readable (`asOf`) until `vacuum`, which keeps the
  *    last K (Delta VACUUM-retention twin, same role as
  *    `StageWriter.vacuum` for stranded swaps);
  *  - concurrent writers are NOT arbitrated (no optimistic-concurrency
  *    log); the pipeline's per-table single-writer model makes that
  *    acceptable, and it is the documented difference vs real Delta.
  */
object VersionedTable {

  private def pointer(table: String) = Paths.get(table, "_latest")
  private def versionDir(table: String, v: Int) = s"$table/v=$v"

  def latestVersion(table: String): Option[Int] = {
    val p = pointer(table)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.toInt)
    else None
  }

  /** All version directories present on disk (committed or stranded),
    * ascending. */
  def versions(table: String): Seq[Int] = {
    val root = Paths.get(table)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val it = Files.list(root).iterator()
      val out = Seq.newBuilder[Int]
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith("v=")) out += name.drop(2).toInt
      }
      out.result().sorted
    }
  }

  /** Write `df` as the next version and atomically repoint `_latest`.
    * Returns the committed version number. */
  def commit(df: DataFrame, table: String): Int = {
    val next = latestVersion(table).getOrElse(0) + 1
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, next))
    val tmp = Paths.get(table, s"_latest.tmp$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read the latest committed snapshot, or `asOf` a specific version. */
  def read(spark: SparkSession, table: String,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed version at $table"))
    val committed = latestVersion(table).getOrElse(Int.MinValue)
    require(asOf.forall(_ <= committed),
      s"versionAsOf ${asOf.get} is ahead of committed $committed")
    spark.read.parquet(versionDir(table, v))
  }

  /** Drop all version directories except the newest `keepLast` committed
    * ones (never the pointed version). Directories NEWER than the pointer
    * are stranded by definition (a crashed commit wrote data but never
    * flipped `_latest`; readers can't see them) and are reclaimed too —
    * that makes vacuum the full stranded-swap cleaner its StageWriter twin
    * is. Returns the removed versions. */
  def vacuum(table: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val committed = latestVersion(table).getOrElse(return Seq.empty)
    val keep = versions(table).filter(_ <= committed).takeRight(keepLast)
      .toSet + committed
    val drop = versions(table).filterNot(keep)
    drop.foreach { v =>
      StageWriter.deleteRecursively(Paths.get(versionDir(table, v)))
    }
    drop
  }
}
