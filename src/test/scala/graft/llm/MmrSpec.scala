package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D222 — MMR diversity reranking: greedy selection math, tie-breaks,
  * and the degenerate-input guards (zero-norm vectors / NaN relevance
  * must fail NAMING the bad row, not die inside the greedy loop). */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cands(rows: (Long, Long, Double, Seq[Double])*) =
    rows.toDF("q", "id", "rel", "v")

  test("lambda=1 reduces to pure relevance order; lambda=0.5 penalizes " +
    "the near-duplicate of an already-picked candidate") {
    // id=1 and id=2 are identical vectors; id=3 is orthogonal
    val df = cands(
      (7L, 1L, 0.95, Seq(1.0, 0.0)),
      (7L, 2L, 0.90, Seq(1.0, 0.0)),
      (7L, 3L, 0.50, Seq(0.0, 1.0)))
    val pure = Similarity.mmrRerank(df, "q", "id", "rel", "v",
        k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L, 3L), "lambda=1 ranks by relevance alone")
    val div = Similarity.mmrRerank(df, "q", "id", "rel", "v",
        k = 2, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    // after picking 1: score(2) = .5*.9 - .5*1.0 < score(3) = .5*.5 - 0
    assert(div == Seq(1L, 3L),
      "rank 2 must prefer the orthogonal doc over the duplicate")
  }

  test("degenerate inputs fail fast and name the bad row") {
    val zero = cands((7L, 1L, 0.9, Seq(1.0, 0.0)),
      (7L, 2L, 0.8, Seq(0.0, 0.0)))
    val e1 = intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerank(zero, "q", "id", "rel", "v",
        k = 2, lambda = 0.5).collect()
    }
    assert(e1.getMessage.contains("zero-norm") ||
      e1.getCause.getMessage.contains("zero-norm vector for query=7 id=2"))
    val nanRel = cands((7L, 1L, Double.NaN, Seq(1.0, 0.0)))
    val e2 = intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerank(nanRel, "q", "id", "rel", "v",
        k = 1, lambda = 0.5).collect()
    }
    assert(e2.getMessage.contains("NaN relevance") ||
      e2.getCause.getMessage.contains("NaN relevance for query=7 id=1"))
    val nanVec = cands((7L, 1L, 0.9, Seq(Double.NaN, 1.0)))
    val e3 = intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerank(nanVec, "q", "id", "rel", "v",
        k = 1, lambda = 0.5).collect()
    }
    assert(e3.getMessage.contains("NaN vector") ||
      e3.getCause.getMessage.contains("NaN vector component"))
  }
}
