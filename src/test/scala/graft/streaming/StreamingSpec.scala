package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Structured-Streaming specs: watermarked window agg equals its batch twin;
  * sessionization closes sessions on gaps; file-source raw→stage streaming
  * ingests appended files incrementally (exactly-once restart). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDf(n: Int) = {
    val base = 1704067200000000000L // 2024-01-01 in ns
    (0 until n).map { i =>
      (i.toLong, base + i.toLong * 61_000_000_000L, i % 3, // 61s apart
        if (i % 2 == 0) "click" else "view", i * 1.5)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("streaming windowed agg matches the batch computation") {
    val dir = Files.createTempDirectory("st").toString
    eventsDf(100).write.parquet(s"$dir/in")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = Streams.windowedAgg(in).writeStream
      .format("memory").queryName("winagg").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("winagg")
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("total").cast("double").as("total"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = Streams.windowedAgg(spark.read.parquet(s"$dir/in"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("total").cast("double").as("total"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("sessionize closes a session after the gap and aggregates within it") {
    import Streams._
    val t0 = 1704067200000L
    val events = Seq(
      Event(1L, new java.sql.Timestamp(t0), 1.0),
      Event(1L, new java.sql.Timestamp(t0 + 10000), 2.0),
      Event(1L, new java.sql.Timestamp(t0 + 20000), 3.0),
      // gap > 60s -> new session
      Event(1L, new java.sql.Timestamp(t0 + 200000), 4.0),
      Event(2L, new java.sql.Timestamp(t0), 9.0)).toDS()
    // micro-batch it through the stateful operator via memory stream;
    // AvailableNow drains the data then stops (ProcessingTimeTimeout keeps
    // scheduling timer batches forever under processAllAvailable)
    implicit val sqlCtx = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    mem.addData(events.collect().toSeq: _*)
    val q = sessionize(mem.toDS(), gapMs = 60000).writeStream
      .format("memory").queryName("sessions").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // the older user-1 session was closed by the in-batch gap; the newer
    // user-1 and user-2 sessions stay open in state awaiting the timeout
    val closed = spark.table("sessions").as[Session].collect()
    assert(closed.length == 1)
    assert(closed(0).user_id == 1L && closed(0).n_events == 3 &&
      closed(0).total_value == 6.0)
    q.stop()
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    val dir = Files.createTempDirectory("st3").toString
    // duplicate every event id twice
    val dup = eventsDf(20).union(eventsDf(20))
    dup.write.parquet(s"$dir/in")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = Streams.dedupStream(in, Seq("event_id")).writeStream
      .format("memory").queryName("dedup").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("dedup").count() == 20)
  }

  test("stream-stream interval join matches its batch twin (bounded state)") {
    val dir = Files.createTempDirectory("st4").toString
    eventsDf(120).write.parquet(s"$dir/in")
    def src() = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    def shape(df: org.apache.spark.sql.DataFrame) =
      (df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "view"))
    val (lc, lv) = shape(src())
    val q = Streams.intervalJoin(lc, lv, "user_id", Seq("event_id"),
        window = "10 minutes").writeStream
      .format("memory").queryName("ssjoin").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("ssjoin")
      .select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    val (bc, bv) = shape(spark.read.parquet(s"$dir/in"))
    val batch = Streams.intervalJoin(bc, bv, "user_id", Seq("event_id"),
        window = "10 minutes")
      .select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming MERGE upsert: later micro-batches replace matched keys") {
    val dir = Files.createTempDirectory("st5").toString
    Seq((1L, "v1"), (2L, "v2")).toDF("k", "v").write.parquet(s"$dir/raw")
    val q = Streams.rawToStageMerge(spark, s"$dir/raw", s"$dir/stage",
      s"$dir/chk", Seq("k"), identity)
    q.processAllAvailable()
    assert(spark.read.parquet(s"$dir/stage").as[(Long, String)]
      .collect().toSet == Set((1L, "v1"), (2L, "v2")))
    // second file updates key 2 and inserts key 3
    Seq((2L, "V2b"), (3L, "v3")).toDF("k", "v")
      .write.mode("append").parquet(s"$dir/raw")
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$dir/stage").as[(Long, String)]
      .collect().toSet == Set((1L, "v1"), (2L, "V2b"), (3L, "v3")))
  }

  test("file-source raw->stage stream picks up appended files incrementally") {
    val dir = Files.createTempDirectory("st2").toString
    eventsDf(10).write.parquet(s"$dir/raw")
    val q = Streams.rawToStage(spark, s"$dir/raw", s"$dir/stage",
      s"$dir/chk", df => df.filter(col("event_type") === "click")
        .withColumn("v2", col("value") * 2))
    q.processAllAvailable()
    val n1 = spark.read.parquet(s"$dir/stage").count()
    assert(n1 == 5)
    // append a new raw file -> only the delta is processed
    eventsDf(20).filter(col("event_id") >= 10)
      .write.mode("append").parquet(s"$dir/raw")
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/stage")
    assert(out.count() == 10)
    assert(out.columns.contains("v2"))
  }

  test("restart from checkpoint: a NEW query resumes exactly-once") {
    val dir = Files.createTempDirectory("st3").toString
    eventsDf(10).write.parquet(s"$dir/raw")
    val q1 = Streams.rawToStage(spark, s"$dir/raw", s"$dir/stage",
      s"$dir/chk", df => df.filter(col("event_type") === "click"))
    q1.processAllAvailable()
    q1.stop() // simulate driver death after a committed batch
    assert(spark.read.parquet(s"$dir/stage").count() == 5)

    eventsDf(20).filter(col("event_id") >= 10)
      .write.mode("append").parquet(s"$dir/raw")
    // a brand-new query against the SAME checkpoint must process ONLY the
    // appended delta — the already-committed batch is never replayed
    val q2 = Streams.rawToStage(spark, s"$dir/raw", s"$dir/stage",
      s"$dir/chk", df => df.filter(col("event_type") === "click"))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(s"$dir/stage")
    assert(out.count() == 10, "restart must not duplicate or drop rows")
    assert(out.select("event_id").distinct().count() == 10)
  }
}
