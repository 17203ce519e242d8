package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Vocabulary build/encode semantics: dense ids in (freq desc, token asc)
  * order, deterministic tie-break, OOV → -1, positions preserved. */
class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "  The CAT  ")).toDF("doc_id", "text")

  test("ids are dense, ordered by freq desc then token asc") {
    val v = Vocab.build(docs, "text", 3)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    // freqs: the=4, cat=2, sat=2, dog=1, mat=1, on=1
    assert(v.map(t => (t._1, t._3)).toSeq ==
      Seq(("the", 0), ("cat", 1), ("sat", 2))) // cat < sat at freq 2
  }

  test("encode preserves positions, maps OOV to -1, normalizes case") {
    val v = Vocab.build(docs, "text", 3)
    val got = Vocab.encode(docs, v, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((1L, 0)) == (0, "the"))
    assert(got((1L, 1)) == (1, "cat"))
    assert(got((1L, 3)) == (-1, "on"))  // OOV
    assert(got((3L, 0)) == (0, "the"))  // trimmed + lowercased
    assert(got((3L, 1)) == (1, "cat"))
    assert(got.size == 6 + 3 + 2)
  }
}
