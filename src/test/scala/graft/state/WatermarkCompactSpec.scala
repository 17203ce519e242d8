package graft.state

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Watermark log retention (the DynamoDB 90-day TTL twin): compaction
  * keeps the last confirmed value per key whatever its age, drops
  * expired history and stranded pendings, fails SAFE on an expired
  * in-flight token, and stays correct racing live savers under the
  * cross-process key locks. */
class WatermarkCompactSpec extends AnyFunSuite {

  private def newStore(): (FileWatermarkStore, String) = {
    val dir = Files.createTempDirectory("wmttl").toString
    (new FileWatermarkStore(dir), dir)
  }
  private def logLines(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".log"))
        .flatMap(p => Files.readAllLines(p).asScala.toSeq)
        .filter(_.nonEmpty)
    } finally s.close()
  }

  test("expired history drops; the last confirmed line survives ANY " +
    "retention window; monotonic reads continue") {
    val (st, dir) = newStore()
    for (v <- 1 to 20) st.confirm(st.savePending("p", "t", "c", v.toString))
    // a second key with only rollbacks
    st.rollback(st.savePending("p", "u", "c", "9"))
    assert(logLines(dir).size == 42)
    // everything is "old" relative to a far-future now — yet the last
    // confirmed line must survive
    val r = st.compact(maxAgeMs = 1,
      nowMs = System.currentTimeMillis() + 3600L * 1000L)
    assert(r.keys == 2 && r.linesDropped == 41, s"got $r")
    assert(logLines(dir).size == 1, "only the last confirmed line stays")
    assert(st.lastConfirmed("p", "t", "c").contains("20"))
    assert(st.lastConfirmed("p", "u", "c").isEmpty)
    // life goes on: the next extract confirms on the compacted log
    st.confirm(st.savePending("p", "t", "c", "21"))
    assert(st.lastConfirmed("p", "t", "c").contains("21"))
  }

  test("an expired in-flight PENDING fails SAFE: its confirm is a no-op " +
    "(batch re-extracts), the watermark never goes backwards; a young " +
    "pending survives and confirms") {
    val (st, _) = newStore()
    st.confirm(st.savePending("p", "t", "c", "100"))
    val stranded = st.savePending("p", "t", "c", "200")
    st.compact(maxAgeMs = 1,
      nowMs = System.currentTimeMillis() + 3600L * 1000L)
    st.confirm(stranded) // pending line expired → protocol no-op
    assert(st.lastConfirmed("p", "t", "c").contains("100"),
      "an expired pending must not confirm (re-extract, never skip)")
    val young = st.savePending("p", "t", "c", "300")
    st.compact(maxAgeMs = 24 * 3600 * 1000L) // real window: keeps it
    st.confirm(young)
    assert(st.lastConfirmed("p", "t", "c").contains("300"))
  }

  test("retention is WALL-CLOCK: a line stamped by a previous process " +
    "expires by its age, not by this JVM's uptime") {
    val (st, dir) = newStore()
    st.confirm(st.savePending("p", "t", "c", "1"))
    // a stranded PENDING from a "previous process", 100 days old — a
    // nanoTime age gate could not see its age at all (arbitrary origin)
    val log = Files.list(Paths.get(dir)).filter(
      _.getFileName.toString.endsWith(".log")).findFirst().get()
    val ancient = System.currentTimeMillis() - 100L * 86400 * 1000
    Files.writeString(log,
      Files.readString(log) + s"$ancient|old-id|PENDING|999\n")
    val r = st.compact(maxAgeMs = 90L * 86400 * 1000)
    assert(r.linesDropped == 1,
      "exactly the 100-day-old pending expires under a 90-day TTL")
    assert(st.lastConfirmed("p", "t", "c").contains("1"),
      "fresh lines and the confirmed tail survive")
  }

  test("a legacy nanoTime stamp (implausibly future) expires instead of " +
    "surviving every window; the confirmed tail still keeps whatever " +
    "stamp it carries") {
    val (st, dir) = newStore()
    st.confirm(st.savePending("p", "t", "c", "1"))
    val log = Files.list(Paths.get(dir)).filter(
      _.getFileName.toString.endsWith(".log")).findFirst().get()
    // a pre-upgrade line stamped with nanoTime (~4e14): permanently
    // above any epoch-millis cutoff, so without the plausibility
    // ceiling it would be retained forever
    Files.writeString(log,
      Files.readString(log) + s"${400000000000000L}|nano-id|PENDING|7\n")
    val r = st.compact(maxAgeMs = 90L * 86400 * 1000)
    assert(r.linesDropped == 1,
      "the legacy nanoTime-stamped pending must expire")
    assert(st.lastConfirmed("p", "t", "c").contains("1"))
  }

  test("compacting mid-race with a live saver preserves monotonicity " +
    "and ends with the final value") {
    val (st, dir) = newStore()
    st.confirm(st.savePending("p", "t", "c", "0"))
    val worker = new Thread(() => {
      for (v <- 1 to 60)
        st.confirm(st.savePending("p", "t", "c", v.toString))
    })
    worker.start()
    var lastSeen = 0L
    while (worker.isAlive) {
      st.compact(maxAgeMs = 0, nowMs = System.currentTimeMillis())
      val now = st.lastConfirmed("p", "t", "c").get.toLong
      assert(now >= lastSeen, s"watermark went backwards: $lastSeen -> $now")
      lastSeen = now
    }
    worker.join()
    st.compact(maxAgeMs = 0, nowMs = System.currentTimeMillis())
    assert(st.lastConfirmed("p", "t", "c").contains("60"))
    assert(logLines(dir).size <= 2,
      "a zero-window compact must leave only the last confirmed tail")
  }
}
