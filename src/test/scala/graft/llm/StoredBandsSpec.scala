package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stored-band-table incremental dedup (D27+): the persisted-state path
  * must equal the from-scratch recompute, including after appends. */
class StoredBandsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "an entirely different document about spark aggregation plans"),
    (3L, "the quick brown fox jumps over the lazy dog today")
  ).toDF("doc_id", "text")
  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog tonight"),
    (11L, "no overlap with anything in the corpus whatsoever indeed")
  ).toDF("doc_id", "text")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e4) / 1e4)

  test("stored + appended bands reproduce the from-scratch result") {
    val fresh = Dedup.minhashLshNewVsCorpus(corpus, batch, "doc_id", "text")
      .collect().map(key).toSet
    val tmp = java.nio.file.Files.createTempDirectory("bands_spec")
    try {
      val bt = tmp.resolve("b").toString
      // write docs 1-2, append doc 3 — the ingest maintenance shape
      Dedup.bandTableFor(corpus.filter($"doc_id" < 3), "doc_id", "text")
        .write.parquet(bt)
      Dedup.bandTableFor(corpus.filter($"doc_id" === 3), "doc_id", "text")
        .write.mode("append").parquet(bt)
      val stored = Dedup.minhashLshBatchVsStoredBands(corpus,
          spark.read.parquet(bt), batch, "doc_id", "text")
        .collect().map(key).toSet
      assert(stored == fresh)
      assert(fresh.exists { case (b, c, j) => b == 10L && c == 1L && j == 1.0 })
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }
}
