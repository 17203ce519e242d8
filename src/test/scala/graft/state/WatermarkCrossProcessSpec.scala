package graft.state

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-process watermark safety: TWO FileWatermarkStore instances (each
  * with its own JVM monitor — the two-pipeline-processes shape) race
  * savePending/confirm on one shared directory. The per-key claim-file
  * lock must serialize every read-modify-write: without it, concurrent
  * whole-file rewrites drop lines (lost updates the reference prevents
  * with DynamoDB conditional writes). */
class WatermarkCrossProcessSpec extends AnyFunSuite {

  test("two stores racing savePending+confirm on one dir: no lost lines, " +
    "every token resolves exactly once, last-confirmed is a real value") {
    val dir = Files.createTempDirectory("wmx").toString
    val a = new FileWatermarkStore(dir)
    val b = new FileWatermarkStore(dir)
    val n = 40
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until n).map { i =>
        Future {
          val s = if (i % 2 == 0) a else b
          val tok = s.savePending("p", "t", "c", s"v$i")
          s.confirm(tok)
          tok.id
        }
      }
      val ids = Await.result(Future.sequence(fs), 2.minutes)
      val log = Paths.get(dir).toFile.listFiles()
        .filter(_.getName.endsWith(".log")).head.toPath
      val lines = Files.readAllLines(log).asScala.filter(_.nonEmpty)
      assert(lines.size == 2 * n,
        s"expected ${2 * n} log lines (PENDING+CONFIRMED per op), got " +
          s"${lines.size} — a lost whole-file rewrite")
      val byId = lines.map(_.split("\\|", 4)).groupBy(_(1))
      assert(byId.keySet == ids.toSet)
      byId.foreach { case (id, ls) =>
        assert(ls.map(_(2)).sorted == Seq("CONFIRMED", "PENDING"),
          s"token $id must have exactly one PENDING and one CONFIRMED")
      }
      val last = a.lastConfirmed("p", "t", "c")
      assert(last.exists(v => v.startsWith("v")),
        s"last confirmed must be one of the written values, got $last")
    } finally pool.shutdown()
  }

  test("a stalled holder whose lock was STOLEN must not delete the new " +
    "owner's lock on release (owner-token conditional delete)") {
    val dir = Files.createTempDirectory("wmsteal").toString
    val s = new FileWatermarkStore(dir, lockStaleMs = 3600000)
    val lock = Paths.get(dir, "k.lock")
    // holder enters the critical section, then stalls long enough to be
    // stolen from: simulate the steal by replacing the lock with a NEW
    // owner's token while the body is still running
    s.withKeyLock("k") {
      assert(Files.exists(lock), "holder must have created the lock")
      Files.writeString(lock, "new-owner-token")
    }
    // the stalled holder's release saw a foreign token: the NEW owner's
    // lock must survive — deleting it would let a third process enter
    // while the second is still inside
    assert(Files.exists(lock), "release deleted a lock it no longer owned")
    assert(Files.readString(lock).trim == "new-owner-token")
    Files.deleteIfExists(lock)
    // normal path: the owner's own release still removes the lock
    s.withKeyLock("k") { assert(Files.exists(lock)) }
    assert(!Files.exists(lock), "owner must release its own lock")
  }

  test("a stale lock from a crashed holder is stolen past lockStaleMs") {
    val dir = Files.createTempDirectory("wmstale").toString
    val lock = Paths.get(dir, "p#t#c.lock") // sanitized key keeps '#'
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    val s = new FileWatermarkStore(dir, lockStaleMs = 1000)
    val tok = s.savePending("p", "t", "c", "v1") // must not deadlock
    s.confirm(tok)
    assert(s.lastConfirmed("p", "t", "c").contains("v1"))
  }
}
