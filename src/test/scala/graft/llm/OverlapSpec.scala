package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D219 (cross-source dup matrix) + D220 (eval-overlap fractions). */
class OverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sourceDupMatrix rolls pairs up per UNORDERED source pair; the " +
    "diagonal is within-source duplication") {
    val docs = Seq((1L, "web"), (2L, "web"), (3L, "books"),
      (4L, "code")).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 2L), (2L, 4L))
      .toDF("id1", "id2")
    val m = Dedup.sourceDupMatrix(pairs, docs, "doc_id", "source")
      .as[(String, String, Long)].collect().toSet
    assert(m == Set(("web", "web", 1L), ("books", "web", 2L),
      ("code", "web", 1L)),
      s"web~books and books~web must land in ONE cell, got $m")
  }

  test("overlapFractions: fraction = shared distinct grams / the EVAL " +
    "side's gram count, thresholded after rounding") {
    // eval doc 100: "a b c d" -> 3-grams {a b c, b c d} (2 grams)
    // corpus doc 1 shares exactly one ("a b c" via "a b c x"): 1/2
    // corpus doc 2 shares both: 2/2; corpus doc 3 shares none
    val corpus = Seq((1L, "a b c x"), (2L, "z a b c d"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val r = Dedup.overlapFractions(corpus, eval, "doc_id", "text",
        width = 3, minFrac = 0.0)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._3, t._4)).toMap
    assert(r(1L) == ((1L, 0.5)) && r(2L) == ((2L, 1.0)), s"got $r")
    assert(!r.contains(3L), "a no-overlap doc must not emit")
    val thresholded = Dedup.overlapFractions(corpus, eval, "doc_id",
      "text", width = 3, minFrac = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(thresholded == Set(2L), "the 0.5 pair must fall to a 0.6 floor")
  }
}
