package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Watermark state: per (project, table, column) monotonically-confirmed last
  * extracted value, with a transactional PENDING → CONFIRMED / ROLLED_BACK
  * protocol (reference
  * utils/extract_data_v2/load/watermark_storage/dynamodb_watermark_storage.py:13-103
  * and transactional_watermark_storage.py:9-189).
  *
  * The local implementation is an append-only newline-JSON log per key —
  * the same (key, timestamp-ordered) shape as the reference's DynamoDB table.
  * State is tiny (one row per configured table), driver-side by design; the
  * 100 TB-scale data never flows through here.
  */
/** `id` is a unique token identity: timestamps alone can collide (coarse
  * clocks, concurrent savePending), and confirming/rolling back on a
  * collided timestamp would resolve the WRONG pending entry. `ts` is
  * WALL-CLOCK epoch millis — it exists for the retention age gate
  * ([[FileWatermarkStore.compact]]), which must survive process
  * restarts: a nanoTime stamp has an arbitrary per-JVM origin, so
  * pre-restart lines would either never expire or expire instantly.
  * Line ORDER (file append order under the key lock) is the sort;
  * nothing orders by `ts`. */
final case class WatermarkToken(key: String, ts: Long, value: String,
    id: String = java.util.UUID.randomUUID().toString)

trait WatermarkStore {
  def savePending(project: String, table: String, column: String,
      value: String): WatermarkToken
  def confirm(token: WatermarkToken): Unit
  def rollback(token: WatermarkToken): Unit
  def lastConfirmed(project: String, table: String,
      column: String): Option[String]
  def delete(project: String, table: String, column: String): Unit
}

object WatermarkStore {
  def key(project: String, table: String, column: String) =
    s"$project#$table#$column"
}

/** In-memory store for tests. */
final class InMemoryWatermarkStore extends WatermarkStore {
  private val state = scala.collection.concurrent.TrieMap[String, String]()
  private val pending = scala.collection.concurrent.TrieMap[String, String]()
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  def savePending(p: String, t: String, c: String, v: String) = {
    val tok = WatermarkToken(WatermarkStore.key(p, t, c), seq.incrementAndGet(), v)
    pending.put(tok.id, tok.key); tok
  }
  def confirm(tok: WatermarkToken): Unit =
    if (pending.remove(tok.id).isDefined) state.put(tok.key, tok.value)
  def rollback(tok: WatermarkToken): Unit = { pending.remove(tok.id); () }
  def lastConfirmed(p: String, t: String, c: String) =
    state.get(WatermarkStore.key(p, t, c))
  def delete(p: String, t: String, c: String): Unit =
    { state.remove(WatermarkStore.key(p, t, c)); () }
}

/** File-backed store: one log file per key under `dir`, each line
  * `ts|tokenId|status|value`; last CONFIRMED line wins (timestamp sort-key
  * semantics of the reference's DynamoDB schema). Writes are atomic
  * (tmp + move) and every read-modify-write — savePending's append,
  * confirm/rollback's status-check-then-append — runs inside a
  * CROSS-PROCESS per-key claim lock ([[withKeyLock]]): two pipeline
  * PROCESSES sharing one store directory serialize exactly like two
  * threads of one process (the JVM monitor alone only covers threads).
  * This is the create-if-absent claim-file pattern the CAS merge uses,
  * standing in for the reference's DynamoDB conditional writes
  * (transactional_watermark_storage.py:9-189). Tokens are matched by
  * their unique id, never by timestamp alone (coarse nanoTime can collide
  * across concurrent saves). */
final class FileWatermarkStore(dir: String, lockStaleMs: Long = 60000,
    lockRetryMs: Long = 5) extends WatermarkStore {
  Files.createDirectories(Paths.get(dir))
  private def path(key: String): Path =
    Paths.get(dir, key.replaceAll("[^A-Za-z0-9#_.-]", "_") + ".log")

  /** Cross-process critical section for one watermark key: win the
    * create-if-absent race on `<key>.lock`, run `body`, release. A lock a
    * crashed holder stranded is STOLEN once older than `lockStaleMs`
    * (age-gated, the same recovery contract as merge-claim vacuum) — size
    * it above the longest log rewrite, which is milliseconds for the
    * one-row-per-table state this store holds.
    *
    * Ownership is a UUID token written into the lock file, and release
    * deletes the lock ONLY while the token still matches: a holder that
    * stalls past `lockStaleMs` inside the critical section may be stolen
    * from, and an unconditional finally-delete would then remove the NEW
    * holder's lock — letting a third process enter while the second is
    * still inside (the cascade the token breaks). The steal itself stays
    * delete-then-RE-RACE-createFile rather than an in-place replace:
    * create-if-absent admits exactly ONE of the racing stealers, whereas
    * two concurrent replaces would both "succeed" and both enter. */
  private[state] def withKeyLock[T](key: String)(body: => T): T = {
    val lock = Paths.get(dir,
      key.replaceAll("[^A-Za-z0-9#_.-]", "_") + ".lock")
    val token = java.util.UUID.randomUUID().toString
    var held = false
    while (!held) {
      try {
        Files.createFile(lock)
        // we own the lock (atomic create-if-absent won); stamping the
        // token is not racing anyone — a stealer can appear only after
        // lockStaleMs, far beyond this write
        Files.writeString(lock, token)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale = scala.util.Try(
            Files.getLastModifiedTime(lock).toMillis <
              System.currentTimeMillis() - lockStaleMs).getOrElse(false)
          if (stale) { scala.util.Try(Files.deleteIfExists(lock)); () }
          else Thread.sleep(lockRetryMs)
      }
    }
    try body
    finally {
      if (scala.util.Try(Files.readString(lock)).toOption
          .exists(_.trim == token))
        { scala.util.Try(Files.deleteIfExists(lock)); () }
    }
  }

  private def append(key: String, ts: Long, id: String, status: String,
      v: String): Unit = {
    val p = path(key)
    val line = s"$ts|$id|$status|$v\n"
    val existing = if (Files.exists(p)) Files.readString(p) else ""
    val tmp = Files.createTempFile(Paths.get(dir), "wm", ".tmp")
    Files.writeString(tmp, existing + line)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Last logged status for a token's unique id, if any. */
  private def statusOf(tok: WatermarkToken): Option[String] = {
    val p = path(tok.key)
    if (!Files.exists(p)) None
    else Files.readAllLines(p).asScala.toSeq.reverse.collectFirst {
      case l if l.split("\\|", 4)(1) == tok.id => l.split("\\|", 4)(2)
    }
  }

  // The JVM monitor keeps same-process threads off the claim-file spin;
  // the key lock serializes ACROSS processes. The status check and the
  // append are ONE critical section — a concurrent save/confirm from
  // another process can never interleave between them.
  def savePending(p: String, t: String, c: String, v: String) =
    synchronized {
      val tok = WatermarkToken(WatermarkStore.key(p, t, c),
        System.currentTimeMillis(), v)
      withKeyLock(tok.key) { append(tok.key, tok.ts, tok.id, "PENDING", v) }
      tok
    }
  // Only a still-PENDING token may confirm: confirm after rollback (or of a
  // stale/unknown token) is a no-op, matching InMemoryWatermarkStore — the
  // two stores must agree on protocol semantics.
  def confirm(tok: WatermarkToken): Unit = synchronized {
    withKeyLock(tok.key) {
      if (statusOf(tok).contains("PENDING"))
        append(tok.key, tok.ts, tok.id, "CONFIRMED", tok.value)
    }
  }
  def rollback(tok: WatermarkToken): Unit = synchronized {
    withKeyLock(tok.key) {
      if (statusOf(tok).contains("PENDING"))
        append(tok.key, tok.ts, tok.id, "ROLLED_BACK", tok.value)
    }
  }

  def lastConfirmed(p: String, t: String, c: String): Option[String] = {
    val f = path(WatermarkStore.key(p, t, c))
    if (!Files.exists(f)) None
    else Files.readAllLines(f).asScala.toSeq.reverse.collectFirst {
      case l if l.split("\\|", 4)(2) == "CONFIRMED" => l.split("\\|", 4)(3)
    }
  }
  def delete(p: String, t: String, c: String): Unit = {
    Files.deleteIfExists(path(WatermarkStore.key(p, t, c))); ()
  }

  final case class Compacted(keys: Int, linesDropped: Long)

  /** Age-gated log retention — the DynamoDB 90-day-TTL twin
    * (`dynamodb_watermark_storage.py:13-103` expires history rows; this
    * log otherwise grows one line per extract forever). Per key, UNDER
    * THE SAME CROSS-PROCESS CLAIM LOCK every read-modify-write takes
    * (so a compaction can never interleave inside another process's
    * status-check-then-append), keep:
    *
    *  - the LAST CONFIRMED line unconditionally, whatever its age —
    *    monotonic incremental extraction survives any retention window;
    *  - every line younger than `maxAgeMs` (in-flight PENDINGs live
    *    here; history inside the window stays auditable).
    *
    * Everything older drops — superseded confirms, resolved or
    * STRANDED pendings (the TTL's actual target). Confirming a token
    * whose pending line was expired is already a protocol no-op (the
    * status check finds nothing), which fails SAFE: the batch simply
    * re-extracts — never a skipped batch, never a backwards watermark.
    * Line stamps and `nowMs` (injectable for tests) are WALL-CLOCK
    * epoch millis, so the age gate is meaningful ACROSS process
    * restarts — a nanoTime basis (arbitrary per-JVM origin) would
    * retain pre-restart lines forever or drop fresh pendings early.
    * Stamps implausibly far in the FUTURE (> now + 1 day) are treated
    * as expired: logs written before the epoch-millis switch carry
    * nanoTime stamps (~4e14, permanently above any epoch cutoff) and
    * would otherwise survive every retention window — the clamp
    * retires them; the last CONFIRMED line is still kept whatever its
    * stamp, so the watermark itself never regresses. */
  def compact(maxAgeMs: Long,
      nowMs: Long = System.currentTimeMillis()): Compacted = synchronized {
    val cutoff = nowMs - maxAgeMs
    // plausibility ceiling: anything stamped beyond this is a legacy
    // nanoTime stamp (or a corrupt line), not a young entry
    val ceiling = nowMs + 86400000L
    var keys = 0
    var dropped = 0L
    val logs = {
      val s = Files.list(Paths.get(dir))
      try s.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".log")).toSeq
      finally s.close()
    }
    logs.foreach { p =>
      val key = p.getFileName.toString.stripSuffix(".log")
      withKeyLock(key) {
        if (Files.exists(p)) {
          val lines = Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
          val lastConfirmedIdx =
            lines.lastIndexWhere(_.split("\\|", 4)(2) == "CONFIRMED")
          val kept = lines.zipWithIndex.collect {
            case (l, i) if i == lastConfirmedIdx ||
              scala.util.Try(l.split("\\|", 4)(0).toLong)
                .toOption.exists(ts => ts >= cutoff && ts <= ceiling) => l
          }
          if (kept.size < lines.size) {
            keys += 1
            dropped += lines.size - kept.size
            val tmp = Files.createTempFile(Paths.get(dir), "wm", ".tmp")
            // empty kept → empty file (a bare "\n" would parse as a line)
            Files.writeString(tmp, kept.map(_ + "\n").mkString)
            Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          }
        }
      }
    }
    Compacted(keys, dropped)
  }
}
