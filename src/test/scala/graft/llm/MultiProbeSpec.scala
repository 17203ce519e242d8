package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Similarity.multiProbeTopK — the flip targets the LEAST-confident
  * plane, and probing it recovers the cross-boundary neighbor a
  * single-probe scan misses. */
class MultiProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two axis planes; query hugs the x-axis from below, neighbor from
  // above: they differ ONLY in the y-plane sign, the query's
  // least-confident bit
  private val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
  private lazy val df = Seq(
    (1L, Array(1.0f, -0.01f)), // query: bucket 01
    (2L, Array(1.0f, 0.01f)),  // near-identical, bucket 11
    (3L, Array(-1.0f, 1.0f))   // far, bucket 10
  ).toDF("vec_id", "embedding")

  private def run(nflip: Int) =
    Similarity.multiProbeTopK(df.filter($"vec_id" === 1L), df,
      "vec_id", "embedding", planes, nflip = nflip, k = 5)
      .select("neighbor_id").as[Long].collect().sorted.toSeq

  test("single probe misses the cross-boundary neighbor") {
    assert(run(0) == Seq.empty)
  }

  test("one flip probes the least-confident plane and finds it — and " +
    "does NOT probe the far bucket") {
    assert(run(1) == Seq(2L))
  }

  test("flips are single-bit: even with both planes flipped, the " +
    "Hamming-2 bucket stays unprobed (probes are 01, 11, 00 — never 10)") {
    assert(run(2) == Seq(2L))
  }

  test("nflip bounds are enforced") {
    intercept[IllegalArgumentException](run(2 + 1))
  }
}
