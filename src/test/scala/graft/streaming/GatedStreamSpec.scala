package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Streams.rawToStageGated — veto routes to quarantine, the stream keeps
  * publishing afterwards, clean batches merge into stage. */
class GatedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a vetoed batch lands whole in quarantine with the reason; " +
    "batches before AND after it still publish") {
    val tmp = java.nio.file.Files.createTempDirectory("gated_spec")
    val (raw, stage, quar, chk) = (tmp.resolve("raw").toString,
      tmp.resolve("stage").toString, tmp.resolve("quar").toString,
      tmp.resolve("chk").toString)
    try {
      def file(rows: Seq[(Long, java.lang.Long)]): Unit =
        rows.toDF("k", "u").coalesce(1).write.mode("append").parquet(raw)
      file(Seq((1L, 10L), (2L, 20L))) // clean
      file(Seq((3L, null), (4L, 40L))) // poisoned
      file(Seq((5L, 50L))) // clean — must still publish after the veto
      val q = Streams.rawToStageGated(spark, raw, stage, quar, chk,
        keys = Seq("k"),
        audit = b => require(b.filter(col("u").isNull).count() == 0,
          "null u"),
        transform = identity)
      q.processAllAvailable(); q.stop()
      val staged = spark.read.parquet(stage).select("k")
        .as[Long].collect().sorted.toSeq
      assert(staged == Seq(1L, 2L, 5L),
        s"stage has $staged — the post-veto batch must land too")
      val quarantined = spark.read.parquet(quar)
      assert(quarantined.select("k").as[Long].collect().sorted.toSeq ==
        Seq(3L, 4L), "the WHOLE vetoed batch quarantines, not just bad rows")
      assert(quarantined.select("quarantine_reason").distinct().count() == 1)
      assert(quarantined.head().getAs[String]("quarantine_reason")
        .contains("null u"))
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }
}
