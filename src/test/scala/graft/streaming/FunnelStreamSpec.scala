package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streams.funnelStream — exact anchors vs the batch chain, window
  * expiry, inclusive ties, cross-epoch chaining through a checkpoint
  * restart. */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, ts, type); W = 100 ns for both steps
  private val events = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 50L, "purchase"),
    (2L, 10L, "view"), (2L, 200L, "click"), // outside [10, 110)
    (3L, 5L, "click"), // no view: never anchors
    (4L, 10L, "view"), (4L, 110L, "click"), // boundary: 110 ∉ [10, 110)
    (5L, 30L, "view"), (5L, 30L, "click"), // tie: >= prev qualifies
    (6L, 50L, "view"), (6L, 120L, "click")) // chains ACROSS the epochs

  private def runStream(): Map[Long, Seq[Long]] = {
    val tmp = java.nio.file.Files.createTempDirectory("sfun_spec")
    val (raw, outp, chk) = (tmp.resolve("raw").toString,
      tmp.resolve("out").toString, tmp.resolve("chk").toString)
    try {
      val feed = events.toDF("user_id", "ts", "event_type")
      feed.filter(col("ts") < 100).coalesce(1).write.parquet(raw)
      val schema = spark.read.parquet(raw).schema
      def run(): Unit = {
        val q = Streams.funnelStream(
            spark.readStream.schema(schema).parquet(raw),
            "view", Seq(("click", 100L), ("purchase", 100L)))
          .toDF().writeStream.format("parquet").option("path", outp)
          .option("checkpointLocation", chk)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      feed.filter(col("ts") >= 100).coalesce(1)
        .write.mode("append").parquet(raw)
      run()
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ver").desc)
      spark.read.parquet(outp)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "anchors")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("streamed anchors equal the batch window chain, including window " +
    "expiry, inclusive ties, and a step chained across the restart") {
    val got = runStream()
    val M = Long.MaxValue
    assert(got(1L) == Seq(10L, 20L, 50L))
    assert(got(2L) == Seq(10L, M, M)) // click outside the window
    assert(got(3L) == Seq(M, M, M)) // never anchored
    assert(got(4L) == Seq(10L, M, M)) // exclusive upper bound
    assert(got(5L) == Seq(30L, 30L, M)) // inclusive lower bound
    assert(got(6L) == Seq(50L, 120L, M)) // epoch-2 click on epoch-1 view
    // cross-check the complete map against the batch operator
    val batch = graft.operators.Funnel.anchors(
      events.toDF("user_id", "ts", "event_type")
        .select(col("user_id"), col("event_type"), col("ts")),
      "user_id", "event_type", "ts", "view",
      Seq(("click", 100L), ("purchase", 100L)))
      .collect().map(r => r.getLong(0) -> Seq(
        r.getLong(1),
        if (r.isNullAt(2)) M else r.getLong(2),
        if (r.isNullAt(3)) M else r.getLong(3))).toMap
    batch.foreach { case (u, a) => assert(got(u) == a, s"user $u") }
  }
}
