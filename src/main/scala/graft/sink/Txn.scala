package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic MULTI-TABLE publish — the multi-statement transaction a
  * warehouse gives you and a files-on-object-store lake classically
  * doesn't (Delta's log is per-table): a fact table and its derived
  * summary must flip together, or a reader joins yesterday's summary to
  * today's facts and reports numbers that were never true.
  *
  * Design: one transaction ROOT owns member [[VersionedTable]]s and a
  * single `_txn_latest` pointer. A transaction commits each member's
  * data as a normal versioned commit (per-table claims serialize
  * per-table writers; the 100 TB data writes of different tables proceed
  * in parallel), records the (table → version) map in a manifest file,
  * and then makes the WHOLE set visible with ONE atomic pointer move —
  * the same primitive the per-table pointer uses, lifted one level.
  * Transaction-level writers serialize through a create-if-absent claim
  * (the CAS pattern shared with `StageWriter.casMerge` and
  * `VersionedTable.commit`).
  *
  * Readers that resolve through [[read]] NEVER consult per-table
  * pointers, so a writer that dies between member commits leaves only
  * invisible versions (reclaimed by each table's vacuum) — readers keep
  * seeing the last complete transaction, and a member table can never be
  * read at a version from a half-published transaction. */
object Txn {

  private def pointer(root: String) = Paths.get(root, "_txn_latest")
  private def manifest(root: String, t: Int) =
    Paths.get(root, "_txn", t.toString)
  private def claim(root: String, t: Int) =
    Paths.get(root, "_txn_claims", t.toString)

  def latestTxn(root: String): Option[Int] = {
    val p = pointer(root)
    if (Files.isRegularFile(p)) Some(Files.readString(p).trim.toInt)
    else None
  }

  /** The (table → version) set a transaction published. */
  def members(root: String, txn: Int): Map[String, Int] =
    Files.readString(manifest(root, txn)).split("\n").filter(_.nonEmpty)
      .map { line =>
        val Array(name, v) = line.split("\t")
        name -> v.toInt
      }.toMap

  /** Atomically publish `writes` (table name → new contents). Returns
    * the transaction id. A concurrent transaction makes the claim CAS
    * throw [[VersionedTable.ConcurrentCommitException]] — retry from the
    * new state, nothing half-published. */
  def commit(root: String, writes: Seq[(String, DataFrame)],
      expectedTxn: Option[Int] = None): Int = {
    require(writes.nonEmpty)
    val base = latestTxn(root).getOrElse(0)
    expectedTxn.filter(_ != base).foreach { e =>
      throw new VersionedTable.ConcurrentCommitException(
        s"$root: expected txn $e but head is $base")
    }
    val next = base + 1
    Files.createDirectories(Paths.get(root, "_txn_claims"))
    try Files.createFile(claim(root, next))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(
          s"$root: txn $next already claimed by a concurrent writer")
    }
    try {
      val versions = writes.map { case (name, df) =>
        require(!name.contains("\t") && !name.contains("\n") &&
          !name.startsWith("_"), s"bad member table name: $name")
        name -> VersionedTable.commit(df, s"$root/$name")
      }
      Files.createDirectories(Paths.get(root, "_txn"))
      Files.writeString(manifest(root, next),
        versions.map { case (n, v) => s"$n\t$v" }.mkString("\n"))
      val tmp = Paths.get(root, s"_txn_latest.tmp$next")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, pointer(root), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case scala.util.control.NonFatal(e) =>
        scala.util.Try(Files.deleteIfExists(claim(root, next)))
        throw e
    }
    next
  }

  /** Reclaim transaction claims. A writer that crashes after claiming
    * `next` but before the pointer flip strands the claim forever: the
    * pointer never advanced, so every later [[commit]] computes the SAME
    * `next`, loses the claim CAS, and throws — the root is permanently
    * wedged with no repair path short of manual deletion. This is the
    * age-gated sweep [[VersionedTable.vacuum]] and `StageWriter.vacuum`
    * already run for their claim dirs, lifted to the transaction level:
    *
    *  - claims AT or BEHIND the committed pointer are spent history (their
    *    transaction committed; no writer ever re-attempts them) — dropped
    *    immediately;
    *  - a claim AHEAD of the pointer is either a live writer mid-commit or
    *    a crashed one — indistinguishable without heartbeats — so it is
    *    reclaimed only once older than `strandedRetentionMs`. Reclaiming a
    *    LIVE claim would hand two writers the same transaction id, so the
    *    retention MUST exceed the longest member-table write (the same
    *    contract, and the same 168 h default, as the per-table vacuums).
    *
    * Member versions a half-committed transaction published stay invisible
    * (readers resolve through the txn pointer only) and are reclaimed by
    * each member table's own vacuum. Returns the txn ids whose claims were
    * released. */
  def vacuum(root: String,
      strandedRetentionMs: Long = 168L * 3600 * 1000): Seq[Int] = {
    val dir = Paths.get(root, "_txn_claims")
    if (!Files.isDirectory(dir)) return Seq.empty
    val committed = latestTxn(root).getOrElse(0)
    val cutoff = System.currentTimeMillis() - strandedRetentionMs
    val s = Files.list(dir)
    val released = try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .flatMap { c =>
        val t = scala.util.Try(c.getFileName.toString.toInt).getOrElse(-1)
        val drop = t >= 0 && (t <= committed ||
          scala.util.Try(Files.getLastModifiedTime(c).toMillis < cutoff)
            .getOrElse(false))
        if (drop && Files.deleteIfExists(c)) Some(t) else None
      }.toSeq
    finally s.close()
    released.sorted
  }

  /** Snapshot-consistent GROUP clone (SURVEY §2D, D221) — the dev/test
    * "database clone": every member of transaction `asOfTxn` (default:
    * the latest complete one) shallow-clones into `dstRoot` PINNED at
    * that transaction's member versions, and the whole cloned set
    * becomes visible through ONE destination transaction pointer. Torn
    * reads are impossible by construction twice over: the source
    * versions come from one manifest (a consistent pair by D158), and
    * the destination publishes them with the same single-pointer flip.
    * Clones are `_ref` files (D169) — a 100 TB group clones in
    * metadata time; the vacuum/eager-failure contract of per-table
    * clones applies per member. Destination writers serialize through
    * the same claim CAS as [[commit]]. */
  def cloneGroup(srcRoot: String, dstRoot: String,
      asOfTxn: Option[Int] = None): Int = {
    val t = asOfTxn.orElse(latestTxn(srcRoot)).getOrElse(
      throw new IllegalStateException(
        s"$srcRoot: no committed transaction"))
    require(latestTxn(srcRoot).exists(t <= _),
      s"cannot clone uncommitted $srcRoot transaction $t")
    val ms = members(srcRoot, t)
    val base = latestTxn(dstRoot).getOrElse(0)
    val next = base + 1
    Files.createDirectories(Paths.get(dstRoot, "_txn_claims"))
    try Files.createFile(claim(dstRoot, next))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(
          s"$dstRoot: txn $next already claimed by a concurrent writer")
    }
    try {
      val versions = ms.toSeq.sortBy(_._1).map { case (name, v) =>
        name -> VersionedTable.cloneShallow(s"$srcRoot/$name",
          s"$dstRoot/$name", asOf = Some(v))
      }
      Files.createDirectories(Paths.get(dstRoot, "_txn"))
      Files.writeString(manifest(dstRoot, next),
        versions.map { case (n, v) => s"$n\t$v" }.mkString("\n"))
      val tmp = Paths.get(dstRoot, s"_txn_latest.tmp$next")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, pointer(dstRoot), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case scala.util.control.NonFatal(e) =>
        scala.util.Try(Files.deleteIfExists(claim(dstRoot, next)))
        throw e
    }
    next
  }

  /** Read a member table AT a transaction (default: the latest complete
    * one) — never through the member's own pointer. */
  def read(spark: SparkSession, root: String, table: String,
      asOfTxn: Option[Int] = None): DataFrame = {
    val t = asOfTxn.orElse(latestTxn(root)).getOrElse(
      throw new IllegalStateException(s"$root: no committed transaction"))
    val v = members(root, t).getOrElse(table,
      throw new IllegalArgumentException(
        s"$root: table $table is not a member of txn $t"))
    VersionedTable.read(spark, s"$root/$table", Some(v))
  }
}
