package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** D127 — streaming CDC latest-wins apply: per-key max-seq state skips
  * stale deliveries within AND across micro-batches; deletes win when
  * latest; the materialized result is delivery-order independent. */
class CdcLatestStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(dir: String, epochs: Seq[Seq[(Long, Long, String, Double)]])
      : Seq[(Long, Long, String, Double, Boolean)] = {
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    epochs.head.toDF("key", "seq", "op", "value").coalesce(1).write.parquet(raw)
    val schema = spark.read.parquet(raw).schema
    def once(): Unit = {
      val in = spark.readStream.schema(schema).parquet(raw)
      val q = Streams.cdcLatestStream(
          in.as[Streams.CdcOp](org.apache.spark.sql.Encoders.product))
        .toDF().writeStream.format("parquet")
        .option("path", outp).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    once()
    epochs.tail.foreach { e =>
      e.toDF("key", "seq", "op", "value").coalesce(1)
        .write.mode("append").parquet(raw)
      once()
    }
    spark.read.parquet(outp)
      .as[(Long, Long, String, Double, Boolean)].collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("stale cross-epoch delivery is skipped; within-batch order is by seq") {
    val dir = Files.createTempDirectory("cdc1").toString
    val got = run(dir, Seq(
      Seq((1L, 5L, "U", 50.0), (1L, 3L, "U", 30.0)), // batch 1: out of order
      Seq((1L, 4L, "U", 40.0), (1L, 6L, "U", 60.0)))) // 4 is stale, 6 fresh
    val byseq = got.map(r => r._2 -> r._5).toMap
    assert(byseq == Map(3L -> true, 5L -> true, 4L -> false, 6L -> true),
      s"got $got")
    graft.sink.StageWriter.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("a delete with the highest sequence erases the key; a stale delete " +
      "does not") {
    val dir = Files.createTempDirectory("cdc2").toString
    val got = run(dir, Seq(
      Seq((7L, 1L, "U", 1.0), (7L, 9L, "D", 0.0)),
      Seq((7L, 5L, "D", 0.0), (8L, 2L, "D", 0.0), (8L, 3L, "U", 3.0))))
    val applied = got.filter(_._5)
    // key 7: delete at 9 is final (stale delete 5 skipped);
    // key 8: upsert at 3 overrides the delete at 2
    val finalOps = applied.groupBy(_._1).map { case (k, rs) =>
      k -> rs.maxBy(_._2)._3 }
    assert(finalOps == Map(7L -> "D", 8L -> "U"), s"got $got")
    assert(got.exists(r => r._2 == 5L && !r._5), "stale delete must skip")
    graft.sink.StageWriter.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
