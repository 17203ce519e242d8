package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-4 regression: the driver-generated events.parquet flipped its
  * annotation from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, ntz) and every
  * `ts div N` query threw AnalysisException. Q.load / Streams.withEventTime
  * must be annotation-agnostic: whatever the parquet writes, downstream
  * always sees nanos-since-epoch bigint (batch) / a timestamp event_time
  * (streaming) with the same epoch values.
  */
class EventTsNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2024-01-01T00:00:05Z and +1h, expressed in micros
  private val microsA = 1704067205000000L
  private val microsB = microsA + 3600L * 1000000L

  private def microsDir: String = {
    val dir = Files.createTempDirectory("evts_micro").toString
    // TimestampType column → parquet TIMESTAMP(MICROS); outputTimestampType
    // default TIMESTAMP_MICROS in Spark 4
    Seq((1L, new Timestamp(microsA / 1000), 7L, "click", 1.5),
      (2L, new Timestamp(microsB / 1000), 8L, "view", 2.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def longDir: String = {
    val dir = Files.createTempDirectory("evts_long").toString
    // plain int64 ts (what NANOS + nanosAsLong surfaces)
    Seq((1L, microsA * 1000L, 7L, "click", 1.5),
      (2L, microsB * 1000L, 8L, "view", 2.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Q.load normalizes a timestamp-annotated ts to nanos bigint") {
    val df = Q.load(spark, microsDir, "events")
    assert(df.schema("ts").dataType == LongType)
    val got = df.orderBy("event_id").select("ts").as[Long].collect()
    assert(got.toSeq == Seq(microsA * 1000L, microsB * 1000L))
    // the exact shape that failed in round 4
    val hours = df.select(expr("ts div 3600000000000").as("h"))
      .as[Long].collect().toSet
    assert(hours == Set(microsA / 3600000000L, microsB / 3600000000L))
  }

  test("Q.load leaves a long ts untouched") {
    val df = Q.load(spark, longDir, "events")
    assert(df.schema("ts").dataType == LongType)
    assert(df.orderBy("event_id").select("ts").as[Long].collect().toSeq ==
      Seq(microsA * 1000L, microsB * 1000L))
  }

  test("withEventTime yields identical event_time for both representations") {
    val a = graft.streaming.Streams
      .withEventTime(spark.read.parquet(s"$microsDir/events.parquet"))
      .orderBy("event_id").select(unix_micros(col("event_time")))
      .as[Long].collect().toSeq
    val b = graft.streaming.Streams
      .withEventTime(spark.read.parquet(s"$longDir/events.parquet"))
      .orderBy("event_id").select(unix_micros(col("event_time")))
      .as[Long].collect().toSeq
    assert(a == Seq(microsA, microsB))
    assert(a == b)
  }
}
