package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D228 — streaming windowed t-digest: per-window digest state survives
  * a checkpoint restart, versions are monotonic (max(ver) = current
  * estimate), estimates stay in the tolerance band of the exact
  * percentile, and windows keep independent state. */
class TdigestStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(dir: String,
      epochs: Seq[Seq[(Long, Double)]]): Seq[(Long, Long, Seq[Double])] = {
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    epochs.head.toDF("w", "v").coalesce(1).write.parquet(raw)
    val schema = spark.read.parquet(raw).schema
    def once(): Unit = {
      val in = spark.readStream.schema(schema).parquet(raw)
      val q = Streams.tdigestWindowStream(in, "w", "v",
          compression = 100, qs = Seq(0.5))
        .toDF().writeStream.format("parquet")
        .option("path", outp).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    once()
    epochs.tail.foreach { e =>
      e.toDF("w", "v").coalesce(1).write.mode("append").parquet(raw)
      once()
    }
    spark.read.parquet(outp)
      .as[(Long, Long, Seq[Double])].collect().sortBy(r => (r._1, r._2))
      .toSeq
  }

  test("digest state survives the restart: the epoch-2 emission's " +
    "version counts BOTH epochs' values and its median reflects them") {
    val dir = Files.createTempDirectory("tdstream").toString
    // window 7: epoch 1 brings 1..100, epoch 2 brings 101..200
    // window 9: epoch 1 only, constant values
    val got = run(dir, Seq(
      (1 to 100).map(i => (7L, i.toDouble)) ++
        (1 to 50).map(_ => (9L, 5.0)),
      (101 to 200).map(i => (7L, i.toDouble))))
    val w7 = got.filter(_._1 == 7L)
    assert(w7.map(_._2) == Seq(100L, 200L),
      s"one emission per batch, versions cumulative (got ${w7.map(_._2)})")
    val medFinal = w7.last._3.head
    assert(math.abs(medFinal - 100.5) <= 100.5 * 0.05,
      s"restart-spanning median must reflect both epochs (got $medFinal)")
    val medFirst = w7.head._3.head
    assert(math.abs(medFirst - 50.5) <= 50.5 * 0.05,
      s"epoch-1 median reflects epoch 1 only (got $medFirst)")
    // window 9 untouched by epoch 2: exactly one emission, exact median
    val w9 = got.filter(_._1 == 9L)
    assert(w9.map(_._2) == Seq(50L) && w9.head._3.head == 5.0,
      s"an idle window emits nothing on later batches (got $w9)")
  }

  test("null window keys / values are filtered, never fatal (the batch " +
    "planes' isNotNull discipline)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("tdstream_null").toString
    val schema = StructType(Seq(StructField("w", LongType, true),
      StructField("v", DoubleType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, 1.0), Row(null, 2.0),
        Row(7L, null), Row(7L, 3.0)), 1), schema)
      .write.parquet(s"$dir/raw")
    val in = spark.readStream.schema(schema).parquet(s"$dir/raw")
    val q = Streams.tdigestWindowStream(in, "w", "v",
        compression = 100, qs = Seq(0.5))
      .toDF().writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/chk")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$dir/out")
      .as[(Long, Long, Seq[Double])].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((7L, 2L)),
      s"only the two non-null (w, v) rows may reach the digest ($got)")
    assert(got.head._3.head >= 1.0 && got.head._3.head <= 3.0,
      s"median of {1, 3} must land inside the band (got $got)")
  }
}
