package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Duplicated-span removal (D111): coverage window, case handling, short
  * docs, whitespace normalization. */
class RemoveDupSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val shared = "alpha beta gamma delta epsilon zeta eta theta"

  private def run(docs: Seq[(Long, String)]) =
    Dedup.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        width = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("an 8-gram shared by two docs removes exactly its span in both") {
    val out = run(Seq(
      (1L, s"$shared unique1 tail1"),
      (2L, s"$shared other2 more2"),
      (3L, "just a few words")))
    assert(out(1L) == (("unique1 tail1", 10L, 8L)))
    assert(out(2L) == (("other2 more2", 10L, 8L)))
    assert(out(3L) == (("just a few words", 4L, 0L)))
  }

  test("matching is case-insensitive but surviving text keeps its case") {
    val out = run(Seq(
      (1L, s"$shared a b"),
      (2L, s"ALPHA beta gamma delta epsilon zeta eta THETA KEEP1 KEEP2")))
    assert(out(2L) == (("KEEP1 KEEP2", 10L, 8L)))
  }

  test("a 9-word shared run covers all 9 positions (overlapping grams " +
    "merge) and whitespace normalizes") {
    val out = run(Seq(
      (1L, s"$shared  iota x"), // double space: 10 words after split
      (2L, s"$shared iota y z")))
    assert(out(1L) == (("x", 10L, 9L)))
    assert(out(2L) == (("y z", 11L, 9L)))
  }

  test("a doc repeating its own span is untouched when no OTHER doc " +
    "shares it (distinct-doc threshold)") {
    val out = run(Seq(
      (1L, s"$shared $shared"),
      (2L, "totally different words here with nothing shared at all")))
    assert(out(1L)._3 == 0L)
  }
}
