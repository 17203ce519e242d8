package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming near-dup dedup (D124): cross-batch detection through the state
  * store, candidates-then-verify semantics (band collision alone never
  * flags), and equivalence with the batch MinHash miner under an
  * ascending-id feed. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runEpochs(dir: String, epochs: Seq[Seq[(Long, String)]])
      : org.apache.spark.sql.DataFrame = {
    val (raw, outp, chk) = (s"$dir/raw", s"$dir/out", s"$dir/chk")
    epochs.head.toDF("doc_id", "text").coalesce(1).write.parquet(raw)
    val schema = spark.read.parquet(raw).schema
    def once(): Unit = {
      val in = spark.readStream.schema(schema).parquet(raw)
      val q = Streams.nearDupStream(in, "doc_id", "text")
        .toDF().writeStream.format("parquet")
        .option("path", outp).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    once()
    epochs.tail.foreach { e =>
      e.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(raw)
      once()
    }
    spark.read.parquet(outp)
      .groupBy("doc_id")
      .agg(max(col("is_dup")).as("is_dup"),
        coalesce(min(when(col("dup_of") >= 0, col("dup_of"))), lit(-1L))
          .as("dup_of"))
  }

  test("a second-epoch near-copy is flagged against FIRST-epoch state; " +
      "dissimilar docs are kept") {
    val dir = Files.createTempDirectory("ndups").toString
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val aDup = a + " today" // high-overlap shingle sets
    val other = "completely different words about spark streaming state stores"
    val got = runEpochs(dir,
      Seq(Seq((1L, a), (2L, other)), Seq((3L, aDup), (4L, "unique text z"))))
      .as[(Long, Boolean, Long)].collect().map { case (id, d, of) =>
        id -> ((d, of)) }.toMap
    assert(got(1L) == ((false, -1L)), "first arrival must be kept")
    assert(got(2L) == ((false, -1L)))
    assert(got(3L) == ((true, 1L)),
      s"cross-epoch near-dup must flag via state, got ${got(3L)}")
    assert(got(4L) == ((false, -1L)))
    graft.sink.StageWriter.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("band collision without similarity does NOT flag (exact-Jaccard " +
      "verification), and a re-delivered id is not its own dup") {
    val dir = Files.createTempDirectory("ndupv").toString
    // identical docs share ALL bands; the re-delivery of id 5 must not
    // mark id 5 a dup of itself
    val t = "some document text that repeats enough words to shingle well"
    val got = runEpochs(dir, Seq(Seq((5L, t)), Seq(Seq((5L, t))).flatten))
      .as[(Long, Boolean, Long)].collect().map { case (id, d, of) =>
        id -> ((d, of)) }.toMap
    assert(got(5L) == ((false, -1L)), s"self-dup on re-delivery: ${got(5L)}")
    graft.sink.StageWriter.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("streaming verdicts equal the batch miner's min-id-wins on the " +
      "documents corpus") {
    val dir = Files.createTempDirectory("ndupb").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val half = 50L
    val epochs = Seq(
      docs.filter($"doc_id" < half).select($"doc_id", $"text")
        .as[(Long, String)].collect().toSeq,
      docs.filter($"doc_id" >= half).select($"doc_id", $"text")
        .as[(Long, String)].collect().toSeq)
    val streamed = runEpochs(dir, epochs)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    val pairs = graft.llm.Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleWidth = 3, k = 32, b = 8, threshold = 0.8)
      .select("id2").as[Long].collect().toSet
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(streamed(id) == pairs.contains(id),
        s"doc $id: streaming=${streamed(id)} batch=${pairs.contains(id)}")
    }
    graft.sink.StageWriter.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
