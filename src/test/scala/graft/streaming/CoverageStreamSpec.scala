package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streams.coverageStream — watermark-fenced island emission: an island
  * leaves state exactly when the watermark passes its end; a late-but-
  * admissible interval MERGES into a still-open island instead of
  * opening a duplicate; a key with no further rows is flushed by the
  * event-time timeout, not by luck. */
class CoverageStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import Streams._

  private val S = 1000000000L // 1 s in ns
  private def iv(u: Long, sSec: Long, eSec: Long) =
    Interval(u, sSec * S, eSec * S, new Timestamp(sSec * 1000))

  test("islands emit when fenced; late overlap merges; idle key flushed " +
    "by the event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Interval]
    val sink = s"cov_spec_${graft.queries.Q.nextSinkId()}"
    val q = coverageStream(mem.toDS(), lateness = "100 seconds")
      .toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // times offset to 1000 s: a row AT the initial watermark epoch (0)
    // is filtered as late before the operator ever sees it.
    // batch A: user 1 [1000,1010]+[1005,1020] overlap; user 2
    // [1000,1005]. Watermark 905 s after the batch — nothing fenced.
    mem.addData(iv(1, 1000, 1010), iv(1, 1005, 1020), iv(2, 1000, 1005))
    q.processAllAvailable()
    assert(spark.table(sink).count() == 0)

    // batch B: [1015,1030] arrives LATE relative to [1005,1020] but
    // above the watermark — admissible, must MERGE into the open island
    mem.addData(iv(1, 1015, 1030))
    q.processAllAvailable()
    assert(spark.table(sink).count() == 0)

    // batch C advances user 1's frontier to 1300 s; the trailing
    // no-data batch (watermark 1200 s) fences user 1's [1000,1030] AND
    // times out idle user 2 (no batch-C row for user 2 — only the
    // event-time timeout can flush it)
    mem.addData(iv(1, 1300, 1301))
    q.processAllAvailable()
    // batch D: watermark 1700 s fences [1300,1301]; [1800,1801] stays
    // open in state
    mem.addData(iv(1, 1800, 1801))
    q.processAllAvailable()
    val out = spark.table(sink)
      .select("user_id", "i_start", "i_end", "n_merged")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    q.stop()
    assert(out == Seq(
      (1L, 1000 * S, 1030 * S, 3L), // overlap + late arrival, ONE island
      (1L, 1300 * S, 1301 * S, 1L),
      (2L, 1000 * S, 1005 * S, 1L))) // idle key — timeout flush
  }

  test("matches the batch twin on an out-of-order feed") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(iv(7, 2050, 2060), iv(7, 2000, 2010), iv(7, 2055, 2070),
      iv(7, 2009, 2020), iv(8, 2000, 2100), iv(8, 2010, 2020))
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Interval]
    mem.addData(rows: _*)
    mem.addData(iv(9, 20000, 20001)) // sentinel advances the watermark
    val sink = s"cov_spec_${graft.queries.Q.nextSinkId()}"
    val q = coverageStream(mem.toDS(), lateness = "1000 seconds")
      .toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table(sink).filter($"user_id" =!= 9L)
      .select("user_id", "i_start", "i_end", "n_merged")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.Intervals.coalesce(
        rows.toDS().toDF().select($"user_id", $"s", $"e"), "user_id", "s", "e")
      .select("user_id", "i_start", "i_end", "n_merged")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
