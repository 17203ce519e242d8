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
  *  - concurrent writers ARE arbitrated, optimistically: a commit first
  *    CLAIMS its version number via an atomic create-if-absent marker
  *    (`_claims/N`), so of two writers racing from the same base exactly
  *    one proceeds and the loser FAILS with
  *    [[VersionedTable.ConcurrentCommitException]] — never silent
  *    last-writer-wins. This is Delta's optimistic-concurrency insight
  *    (the commit file's atomic create IS the lock,
  *    `light_transform.py:1363-1409` relies on it via the Delta log)
  *    reduced to one marker file. A writer that crashes between claim and
  *    pointer flip strands its claim + data dir; both are invisible to
  *    readers and reclaimed by `vacuum` (the documented recovery step,
  *    like cleaning Delta's orphaned files).
  */
object VersionedTable {

  /** A concurrent writer won the race for this version (or the table head
    * moved past the caller's expected base). The table is untouched by the
    * loser; re-read the head and retry, or vacuum stranded claims. */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  private def pointer(table: String) = Paths.get(table, "_latest")
  private def versionDir(table: String, v: Int) = s"$table/v=$v"
  private def claim(table: String, v: Int) =
    Paths.get(table, "_claims", v.toString)

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
    * Returns the committed version number.
    *
    * Concurrency: fails (never overwrites) when another writer holds the
    * next version's claim, or — with `expectedBase` — when the head has
    * moved since the caller read it (the read-version check of an
    * optimistic transaction). The claim is taken BEFORE the expensive
    * data write, so the loser fails fast. */
  private def tsMarker(table: String, v: Int) =
    Paths.get(table, "_commit_ts", v.toString)

  /** Write–audit–publish (Iceberg's WAP pattern): stage the data as the
    * next version, run `audit` against the STAGED files (row counts,
    * null keys, distribution checks — whatever the contract is), and
    * flip the pointer ONLY if the audit returns normally. An audit
    * throw aborts the publish: staged data and claim are cleaned up,
    * readers never saw anything, and the exception propagates to the
    * caller with the head unchanged — bad data can not reach a reader
    * even for an instant, which post-write checking cannot promise. */
  def commitAudited(df: DataFrame, table: String,
      audit: DataFrame => Unit,
      expectedBase: Option[Int] = None,
      commitTs: Long = System.currentTimeMillis): Int =
    commitImpl(df, table, expectedBase, commitTs, Some(audit))

  def commit(df: DataFrame, table: String,
      expectedBase: Option[Int] = None,
      commitTs: Long = System.currentTimeMillis): Int =
    commitImpl(df, table, expectedBase, commitTs, None)

  private def commitImpl(df: DataFrame, table: String,
      expectedBase: Option[Int],
      commitTs: Long,
      audit: Option[DataFrame => Unit]): Int = {
    val base = latestVersion(table).getOrElse(0)
    expectedBase.filter(_ != base).foreach { e =>
      throw new ConcurrentCommitException(
        s"$table: expected committed base $e but head is $base — " +
          "a concurrent writer committed first")
    }
    val next = base + 1
    Files.createDirectories(Paths.get(table, "_claims"))
    try Files.createFile(claim(table, next))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(
          s"$table: version $next is already claimed by a concurrent " +
            s"writer (committed head is $base) — retry from the new head, " +
            "or vacuum if the claimant crashed")
    }
    // from here on we HOLD the claim: an in-process failure before the
    // pointer flip must release it, or every retry of this same commit
    // would fail "already claimed" until vacuum's stranded retention
    // elapses — an observed failure is not a crash, so clean up eagerly
    try {
      // commit timestamps must be monotone (commits serialize via the
      // claim, so wall clocks are; an INJECTED clock must honor it too —
      // AS OF resolution binary-searches on this order)
      latestVersion(table).filter(_ >= 1).foreach { prev =>
        val m = tsMarker(table, prev)
        if (Files.isRegularFile(m)) {
          val prevTs = Files.readString(m).trim.toLong
          require(commitTs >= prevTs,
            s"$table: commitTs $commitTs precedes version $prev's $prevTs")
        }
      }
      df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, next))
      // write-time contracts bind to the transactional sink too (D205):
      // CHECKs declared for the TABLE ROOT validate the STAGED version's
      // bytes at this WAP point — a violating commit aborts below with
      // the pointer untouched, so no reader (head or AS OF) can ever
      // see a version that broke a declared invariant. No-op for
      // undeclared tables.
      Checks.enforceStaged(df.sparkSession, versionDir(table, next),
        table, df.schema)
      // WAP audit point: staged data exists, nothing is visible yet —
      // a throw here lands in the cleanup below (version dir + claim
      // removed, pointer untouched)
      audit.foreach(a => a(
        df.sparkSession.read.parquet(versionDir(table, next))))
      Files.createDirectories(Paths.get(table, "_commit_ts"))
      Files.writeString(tsMarker(table, next), commitTs.toString)
      val tmp = Paths.get(table, s"_latest.tmp$next")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case scala.util.control.NonFatal(e) =>
        scala.util.Try(StageWriter.deleteRecursively(
          Paths.get(versionDir(table, next))))
        scala.util.Try(Files.deleteIfExists(claim(table, next)))
        throw e
    }
    next
  }

  /** Transactional MERGE upsert through the CAS commit path, for a
    * multi-writer deployment that also wants TIME TRAVEL (the reference
    * runs 60 concurrent transforms, `group_stack.py:375`, and relies on
    * Delta's optimistic transactions for exactly this,
    * `light_transform.py:1382-1392`). `StageWriter.mergeInto` runs the
    * same optimistic claim protocol over the flat stage layout; this
    * variant additionally keeps every committed version readable.
    *
    * Optimistic-transaction loop: read the head, merge the delta against
    * that snapshot, commit with `expectedBase` = the version read. A
    * concurrent winner makes the commit fail the claim CAS (never a silent
    * overwrite); the loser then RE-READS the new head, RE-MERGES its delta
    * and retries — so its rows land on top of the winner's instead of
    * clobbering them. Exponential backoff between attempts bounds the
    * stampede while a winner is mid-data-write. Each successful call
    * commits exactly one version regardless of retries.
    *
    * The merge itself is one key-shuffle (`StageWriter.merge`); only the
    * commit (pointer flip) is serialized — the 100 TB data work of racing
    * writers proceeds in parallel, which is the Delta concurrency model. */
  def mergeCommit(spark: SparkSession, table: String, delta: DataFrame,
      keys: Seq[String], maxRetries: Int = 8,
      backoffMs: Long = 100): Int = {
    var attempt = 0
    while (true) {
      val base = latestVersion(table)
      val merged = base match {
        case Some(v) =>
          StageWriter.merge(read(spark, table, Some(v)), delta, keys)
        case None => delta.dropDuplicates(keys)
      }
      try return commit(merged, table, expectedBase = Some(base.getOrElse(0)))
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          // winner may still be writing data under its claim: back off so
          // the re-read sees the moved head instead of re-losing the claim
          Thread.sleep(backoffMs * math.min(attempt, 5))
      }
    }
    -1 // unreachable
  }

  /** Read the latest committed snapshot, or `asOf` a specific version.
    *
    * RETENTION CONTRACT vs `vacuum`: time travel only reaches versions
    * vacuum kept — asking for a reclaimed version fails EAGERLY here with
    * a clear error (not a Parquet path error). A reader that already
    * planned over a version when vacuum reclaims it mid-read fails at
    * execution (missing input files abort the job — Spark's
    * ignoreMissingFiles stays false), NEVER silently returns partial
    * rows; deployments that hold old snapshots open across vacuum windows
    * must size `vacuum(keepLast)` over their longest reader, exactly
    * Delta's VACUUM-retention rule (light_transform.py:1394-1409). */
  def read(spark: SparkSession, table: String,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed version at $table"))
    val committed = latestVersion(table).getOrElse(Int.MinValue)
    require(asOf.forall(_ <= committed),
      s"versionAsOf ${asOf.get} is ahead of committed $committed")
    val dir = resolveDataDir(table, v)
    if (!Files.isDirectory(Paths.get(dir)))
      throw new IllegalStateException(
        s"$table: version $v is not on disk — reclaimed by vacuum " +
          "(here or, for a shallow clone, on the SOURCE table; committed " +
          s"head is $committed); raise vacuum(keepLast) to cover the " +
          "oldest snapshot readers and clones still need")
    spark.read.parquet(dir)
  }

  /** The directory a version's data actually lives in: a shallow-clone
    * version holds a one-line `_ref` pointer instead of data files.
    * One level by construction — [[cloneShallow]] always stores the
    * RESOLVED source dir, so chains of clones stay flat. */
  private def resolveDataDir(table: String, v: Int): String = {
    val vd = versionDir(table, v)
    val ref = Paths.get(vd, "_ref")
    if (Files.isRegularFile(ref)) Files.readString(ref).trim else vd
  }

  /** The resolved data directory of a committed version — the bytes a
    * reader (or a shallow clone's `_ref`) actually consumes. For the
    * erasure composition ([[Erasure.eraseVersioned]]), which must reach
    * every retained snapshot's physical bytes. */
  private[sink] def snapshotDataDir(table: String, v: Int): String =
    resolveDataDir(table, v)

  /** Shallow clone (Delta `SHALLOW CLONE` / snapshot import): commit a
    * version of `dst` that REFERENCES `src`'s resolved snapshot directory
    * — zero data copied; the new version dir holds one `_ref` pointer
    * file. Writes to the clone commit normal full versions afterward
    * (copy-on-write at table granularity), so clone and source never
    * observe each other's commits. Like Delta's shallow clone, the clone
    * does NOT pin source retention: vacuuming the source past the
    * referenced version breaks the clone's referencing version — [[read]]
    * then fails EAGERLY with the vacuum message, never partial rows —
    * so size the source's `vacuum(keepLast)` over live clones. Goes
    * through the same claim CAS + atomic pointer flip as [[commit]];
    * `dst` may already exist (the clone lands as its next version).
    * Returns the committed clone version. */
  def cloneShallow(src: String, dst: String, asOf: Option[Int] = None,
      commitTs: Long = System.currentTimeMillis): Int = {
    val srcV = asOf.orElse(latestVersion(src)).getOrElse(
      throw new IllegalStateException(s"no committed version at $src"))
    require(asOf.forall(v => latestVersion(src).exists(v <= _)),
      s"cannot clone uncommitted $src version ${asOf.getOrElse(-1)}")
    val srcDir = Paths.get(resolveDataDir(src, srcV)).toAbsolutePath
    if (!Files.isDirectory(srcDir))
      throw new IllegalStateException(
        s"$src: version $srcV is not on disk — reclaimed by vacuum")
    val base = latestVersion(dst).getOrElse(0)
    val next = base + 1
    Files.createDirectories(Paths.get(dst, "_claims"))
    try Files.createFile(claim(dst, next))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(
          s"$dst: version $next is already claimed by a concurrent writer")
    }
    try {
      latestVersion(dst).filter(_ >= 1).foreach { prev =>
        val m = tsMarker(dst, prev)
        if (Files.isRegularFile(m)) {
          val prevTs = Files.readString(m).trim.toLong
          require(commitTs >= prevTs,
            s"$dst: commitTs $commitTs precedes version $prev's $prevTs")
        }
      }
      val vd = Paths.get(versionDir(dst, next))
      Files.createDirectories(vd)
      Files.writeString(vd.resolve("_ref"), srcDir.toString)
      Files.createDirectories(Paths.get(dst, "_commit_ts"))
      Files.writeString(tsMarker(dst, next), commitTs.toString)
      val tmp = Paths.get(dst, s"_latest.tmp$next")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, pointer(dst), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case scala.util.control.NonFatal(e) =>
        scala.util.Try(StageWriter.deleteRecursively(
          Paths.get(versionDir(dst, next))))
        scala.util.Try(Files.deleteIfExists(claim(dst, next)))
        throw e
    }
    next
  }

  /** Change-data feed between two snapshots (Delta CDF twin, read side):
    * full-row diff of `fromV` → `toV` as (change, row...) with change ∈
    * {insert, delete} — an update surfaces as delete+insert of the keyed
    * row versions. One anti-join each way on all columns; at scale both
    * sides hash-partition on the same row hash so AQE picks the join. */
  /** Newest committed version whose recorded commit timestamp is ≤ `ts`
    * (Delta's `TIMESTAMP AS OF` resolution): None when no committed
    * version is that old. Only versions at or below the pointer count —
    * a stranded in-flight writer's marker is invisible. */
  def versionAsOf(table: String, ts: Long): Option[Int] = {
    val head = latestVersion(table).getOrElse(return None)
    (1 to head).reverseIterator.find { v =>
      val m = tsMarker(table, v)
      Files.isRegularFile(m) && Files.readString(m).trim.toLong <= ts
    }
  }

  /** Snapshot read at a TIMESTAMP (the monotone-commit-ts contract of
    * [[commit]] makes this the newest state visible at `ts`). */
  def readAsOf(spark: SparkSession, table: String, ts: Long): DataFrame =
    read(spark, table, Some(versionAsOf(table, ts).getOrElse(
      throw new IllegalArgumentException(
        s"$table: no committed version at or before ts $ts"))))

  def diff(spark: SparkSession, table: String, fromV: Int, toV: Int)
      : DataFrame = {
    val a = read(spark, table, Some(fromV))
    val b = read(spark, table, Some(toV))
    import org.apache.spark.sql.functions._
    b.exceptAll(a).withColumn("change", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("delete")))
  }

  /** PUBLIC change-data-feed read (SURVEY §2D, D226 — the Delta
    * `table_changes(from, to)` consumer surface): the row-level op
    * stream between two committed versions in the engine-wide
    * change-feed convention — a `change` column ∈ {insert, delete}
    * carrying full rows, an UPDATE traveling as its delete+insert
    * pair — the exact shape D165's `Rollup.applyChanges`, D184's
    * min/max maintenance and the CDC-egress replica path consume, now
    * one public contract instead of an internal detail of each.
    *
    * `fromV = 0` is the new-consumer bootstrap: the `toV` snapshot as
    * pure inserts (nothing existed before version 1). Both endpoints
    * must still EXIST — a feed across a vacuumed snapshot refuses
    * loudly instead of returning a silently-partial feed (the one
    * failure a change-feed consumer cannot detect downstream).
    *
    * Scale shape: the feed recomputes from the two snapshots (the
    * storage trade of not persisting per-commit change files,
    * documented at [[replicateTo]]); what multiplies across consumers
    * is the APPLY side, which stays delta-proportional. */
  def readChangeFeed(spark: SparkSession, table: String, fromV: Int,
      toV: Int): DataFrame = {
    val head = latestVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed version at $table"))
    require(fromV >= 0 && fromV < toV && toV <= head,
      s"$table: change feed needs 0 <= from < to <= head=$head " +
        s"(got from=$fromV, to=$toV)")
    val have = versions(table).toSet
    require(fromV == 0 || have.contains(fromV),
      s"$table: version $fromV no longer exists (vacuumed?) — " +
        "a partial change feed would silently corrupt every consumer")
    require(have.contains(toV),
      s"$table: version $toV does not exist")
    import org.apache.spark.sql.functions._
    if (fromV == 0)
      read(spark, table, Some(toV)).withColumn("change", lit("insert"))
    else diff(spark, table, fromV, toV)
  }

  /** Restore an old snapshot as the NEW head (Delta RESTORE twin): commits
    * version `v`'s data as the next version — history is preserved (the
    * restore is itself a commit), readers flip atomically, and the
    * optimistic-concurrency claim applies like any other commit. */
  def rollback(spark: SparkSession, table: String, v: Int): Int = {
    val committed = latestVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed version at $table"))
    require(v <= committed, s"cannot restore $v: head is $committed")
    commit(read(spark, table, Some(v)), table, expectedBase = Some(committed))
  }

  /** Drop all version directories except the newest `keepLast` committed
    * ones (never the pointed version). Directories and claims NEWER than
    * the pointer are stranded ONLY if their claimant died — an in-flight
    * commit between claim and pointer flip looks identical — so they are
    * reclaimed only past `strandedRetentionMs` (claim-file age), the same
    * live-work guard (and same 168 h default) as StageWriter.vacuum's
    * swap retention. Reclaiming a LIVE writer's claim would let a second
    * writer take the same version number — exactly the silent overwrite
    * the claim CAS exists to prevent — so the retention MUST exceed the
    * longest possible data write; age is the only signal a lock file
    * offers (no heartbeats), which is the documented limit of this
    * single-filesystem protocol. Returns the removed versions. */
  def vacuum(table: String, keepLast: Int,
      strandedRetentionMs: Long = 168L * 3600 * 1000): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val committed = latestVersion(table).getOrElse(return Seq.empty)
    val now = System.currentTimeMillis()
    def strandedExpired(v: Int): Boolean = {
      val c = claim(table, v)
      val stamp =
        if (Files.exists(c)) Files.getLastModifiedTime(c).toMillis
        else scala.util.Try(Files.getLastModifiedTime(
          Paths.get(versionDir(table, v))).toMillis).getOrElse(0L)
      now - stamp >= strandedRetentionMs
    }
    val keep = versions(table).filter(_ <= committed).takeRight(keepLast)
      .toSet + committed
    val drop = versions(table).filterNot(keep)
      .filter(v => v <= committed || strandedExpired(v))
    drop.foreach { v =>
      StageWriter.deleteRecursively(Paths.get(versionDir(table, v)))
      Files.deleteIfExists(claim(table, v))
    }
    // a crashed commit may have claimed a version without ever writing its
    // dir — release those too (they'd block the head forever otherwise),
    // under the same retention guard
    val claimsDir = Paths.get(table, "_claims")
    if (Files.isDirectory(claimsDir)) {
      val st = Files.list(claimsDir)
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val c = it.next()
          val v = scala.util.Try(c.getFileName.toString.toInt).getOrElse(-1)
          if (v > committed && strandedExpired(v)) Files.deleteIfExists(c)
        }
      } finally st.close()
    }
    drop
  }

  /** One replica sync: the head version it reached and how many change
    * rows it applied (0 = already current). */
  final case class ReplicaSync(head: Int, applied: Long)

  /** Incremental CDC egress — keep a downstream PLAIN-parquet replica
    * current with this versioned table by applying only what CHANGED
    * since the replica's last sync (Delta's change-data-feed consumer
    * shape). The replica remembers its last-applied version in a sibling
    * marker file; each sync diffs `(lastApplied, head]`, collapses the
    * row-level diff to key-level CDC ops (a key with a replacement row
    * is an upsert; a key whose rows only disappeared is a delete), and
    * applies them through [[StageWriter.mergeCdcInto]] — so the APPLY
    * side rewrites only key-intersecting replica files (O(delta)), and a
    * re-run after a crash between merge and marker write re-applies an
    * idempotent batch (upserts replace, deletes no-op).
    *
    * The diff here recomputes from two snapshots (O(snapshot) read — the
    * storage trade of not persisting per-commit change files); the
    * replica-side cost, which is what multiplies across consumers, is
    * delta-proportional. `keys` must be unique per row (the [[StageWriter
    * .mergeInto]] contract). */
  def replicateTo(spark: SparkSession, table: String, replica: String,
      keys: Seq[String]): ReplicaSync = {
    import org.apache.spark.sql.functions._
    val head = latestVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed version at $table"))
    val marker = Paths.get(replica + ".applied_version")
    val last =
      if (Files.isRegularFile(marker)) Files.readString(marker).trim.toInt
      else 0
    if (last >= head) return ReplicaSync(head, 0L)
    // consume the PUBLIC change-feed contract (D226) and collapse the
    // row-level feed to key-level CDC ops: a key with a replacement row
    // is an upsert, a key whose rows only disappeared is a delete
    val d = readChangeFeed(spark, table, last, head)
    val ins = d.filter(col("change") === "insert").drop("change")
    val delOnly = d.filter(col("change") === "delete").drop("change")
      .join(ins.select(keys.map(col): _*), keys, "left_anti")
    val delta = ins.withColumn("op", lit("U"))
      .unionByName(delOnly.withColumn("op", lit("D")))
    val cached = delta.cache()
    val applied = cached.count()
    try {
      StageWriter.mergeCdcInto(spark, cached, replica, keys)
      Files.writeString(marker, head.toString)
    } finally cached.unpersist()
    ReplicaSync(head, applied)
  }
}
