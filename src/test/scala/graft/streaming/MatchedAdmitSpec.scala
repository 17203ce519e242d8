package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D225 — streaming quota admission: counters persist across a restart,
  * quotas never overflow, absent buckets admit nothing, and within one
  * batch ties order by (hash, id). */
class MatchedAdmitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(dir: String, quotas: Map[Long, Long],
      epochs: Seq[Seq[(Long, Long)]]): Seq[(Long, Long, Long)] = {
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    epochs.head.toDF("id", "b").coalesce(1).write.parquet(raw)
    val schema = spark.read.parquet(raw).schema
    def once(): Unit = {
      val in = spark.readStream.schema(schema).parquet(raw)
      val q = Streams.matchedAdmitStream(in, "id", col("b"), quotas)
        .toDF().writeStream.format("parquet")
        .option("path", outp).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    once()
    epochs.tail.foreach { e =>
      e.toDF("id", "b").coalesce(1).write.mode("append").parquet(raw)
      once()
    }
    spark.read.parquet(outp)
      .select(col("bucket"), col("id"), col("seq"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
  }

  test("counters persist across the restart: epoch 2 admits only the " +
    "remaining quota; an unquota'd bucket admits nothing") {
    val dir = Files.createTempDirectory("madmit").toString
    // bucket 0 quota 3: epoch 1 brings 2, epoch 2 brings 5 (1 admitted)
    // bucket 9 has no quota
    val got = run(dir, Map(0L -> 3L),
      Seq(Seq((10L, 0L), (11L, 0L), (90L, 9L)),
        Seq((12L, 0L), (13L, 0L), (14L, 0L), (15L, 0L), (16L, 0L))))
    assert(got.size == 3, s"quota 3 must admit exactly 3, got $got")
    assert(got.map(_._3) == Seq(1L, 2L, 3L), "admission seq dense")
    assert(got.take(2).map(_._2).toSet == Set(10L, 11L),
      "epoch-1 arrivals admitted first")
    assert(!got.exists(_._1 == 9L), "no quota, no admission")
    // the epoch-2 admit is the smallest (hash, id) of ITS batch —
    // recompute the expected winner
    val e2 = Seq(12L, 13L, 14L, 15L, 16L)
    val h = e2.toDF("id")
      .select(col("id"), graft.llm.Dedup.portableWordHash(col("id"))
        .as("h"))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1))
    assert(got.last._2 == h.head._1,
      "within a batch, ties order by (hash, id)")
  }

  test("a replayed epoch (same checkpoint, no new files) admits nothing " +
    "more") {
    val dir = Files.createTempDirectory("madmit2").toString
    val got = run(dir, Map(0L -> 10L),
      Seq(Seq((1L, 0L), (2L, 0L))))
    assert(got.size == 2)
    // re-run with no new data: counters unchanged, no duplicates
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    val in = spark.readStream
      .schema(spark.read.parquet(raw).schema).parquet(raw)
    val q = Streams.matchedAdmitStream(in, "id", col("b"),
        Map(0L -> 10L))
      .toDF().writeStream.format("parquet")
      .option("path", outp).option("checkpointLocation", chk)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(outp).count() == 2,
      "an idle restart must not re-admit")
  }
}
