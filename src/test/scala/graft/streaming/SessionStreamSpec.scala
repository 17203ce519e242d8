package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D237 — streaming session windows: state survives a checkpoint
  * restart, an out-of-order event BRIDGES two open sessions into one,
  * emission happens only once the watermark fences end + gap, and the
  * result equals the batch gaps-and-islands sessionizer. */
class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000L * 1000 * 1000 // 1 s in ns
  private val Gap = 100 * S
  // realistic epoch base: an event at raw ts 0 would sit exactly AT the
  // initial watermark (0) and be dropped as late — real feeds never do
  private val Base = 1000000L * S

  /** Feed epochs one restart apart; returns (user, start, end, n, cents)
    * with the far-future sentinel row already filtered. */
  private def run(dir: String, epochs: Seq[Seq[(Long, Long, Long)]],
      lateness: String = "1000 seconds")
      : Seq[(Long, Long, Long, Long, Long)] = {
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    def write(rows: Seq[(Long, Long, Long)]): Unit =
      rows.map { case (u, t, c) => (u, Base + t, c) }
        .toDF("user_id", "ts", "cents")
        .withColumn("event_time",
          timestamp_micros((col("ts") / 1000).cast("long")))
        .coalesce(1).write.mode("append").parquet(raw)
    def once(): Unit = {
      val schema = spark.read.parquet(raw).schema
      val in = spark.readStream.schema(schema).parquet(raw)
      val q = Streams.sessionStream(
          in.as[Streams.SessEvent](org.apache.spark.sql.Encoders.product),
          gapNs = Gap, lateness = lateness)
        .toDF().writeStream.format("parquet")
        .option("path", outp).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    epochs.foreach { e => write(e); once() }
    spark.read.parquet(outp)
      .filter(col("user_id") =!= -999L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2 - Base, r._3 - Base, r._4, r._5))
      .sortBy(r => (r._1, r._2)).toSeq
  }

  test("an out-of-order bridge event arriving AFTER a restart merges " +
    "two open sessions carried in state; the sentinel closes all") {
    val dir = Files.createTempDirectory("sessstream").toString
    val got = run(dir, Seq(
      // epoch 1: user 1 opens TWO sessions (0 and 200 s, gap 100 s);
      // user 2 one singleton
      Seq((1L, 0L, 10L), (1L, 200 * S, 20L), (2L, 0L, 5L)),
      // epoch 2 (after restart): 100 s bridges user 1's sessions;
      // sentinel pushes the watermark past everything
      Seq((1L, 100 * S, 40L), (-999L, 10000 * S, 0L))))
    assert(got == Seq(
      (1L, 0L, 200 * S, 3L, 70L),
      (2L, 0L, 0L, 1L, 5L)),
      s"bridge-merge + restart must yield one 3-event session (got $got)")
  }

  test("emission waits for the watermark fence: nothing emits while " +
    "every session is still reachable, everything emits exactly once " +
    "after the fence, matching the batch sessionizer") {
    val dir = Files.createTempDirectory("sessstream2").toString
    val events = (0 until 20).map { i =>
      (3L + i % 3, (i * 70L) * S, 1L) // per-user step 210 s > gap:
                                      // every event its own session
    }
    // epoch 1 alone: the lateness horizon covers the whole span
    // (max ts 1330 s + gap < 2000 s) → nothing may close yet
    val partial = run(dir, Seq(events), lateness = "2000 seconds")
    assert(partial.isEmpty, s"no session may emit pre-fence ($partial)")
    // sentinel epoch closes everything; equality with the batch twin
    val got = run(dir, Seq(Seq((-999L, 100000L * S, 0L))),
      lateness = "2000 seconds")
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      events.toDF("user_id", "ts", "cents")
        .withColumn("new_s",
          when(col("ts") - lag("ts", 1).over(w) > Gap, 1).otherwise(0))
        .withColumn("sid", sum("new_s")
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("s"), max("ts").as("e"),
          count(lit(1)).as("n"), sum("cents").as("c"))
        .select("user_id", "s", "e", "n", "c")
        .as[(Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    }
    assert(got == batch,
      s"stream sessions must equal the batch twin ($got vs $batch)")
  }
}
