package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TDigest: mid-quantile accuracy inside the δ error envelope on uniform
  * and heavy-tailed data, bounded centroid count at any input size, and
  * partition-order insensitivity within tolerance. */
class TDigestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic scramble so inserts arrive in no useful order
  private def scrambled(n: Int): Seq[Double] =
    (0 until n).map(i => ((i * 2654435761L) % n).toDouble)

  private def est(vals: Seq[Double], parts: Int, qs: Seq[Double],
      compression: Double = 200): Seq[Double] = {
    val df = vals.toDF("v").repartition(parts)
    df.agg(TDigest.quantiles(col("v"), compression, qs))
      .head().getSeq[Double](0)
  }

  test("uniform 0..n: p25/p50/p75 within 0.5% of exact") {
    val n = 100000
    val got = est(scrambled(n), 8, Seq(0.25, 0.5, 0.75))
    val exact = Seq(0.25, 0.5, 0.75).map(_ * (n - 1))
    got.zip(exact).foreach { case (g, e) =>
      assert(math.abs(g - e) <= e * 0.005, s"got $g expected ~$e")
    }
  }

  test("heavy tail (x^3 growth): p50 and p99 within 1% of exact") {
    val n = 50000
    val base = scrambled(n).map(x => x * x * x / 1e6 + 1)
    val sorted = base.sorted
    val got = est(base, 8, Seq(0.5, 0.99))
    val exact = Seq(0.5, 0.99).map(q => sorted(((n - 1) * q).toInt))
    got.zip(exact).foreach { case (g, e) =>
      assert(math.abs(g - e) <= e * 0.01, s"got $g expected ~$e")
    }
  }

  test("centroid count is bounded regardless of input size") {
    val agg = new TDigest(100, Array(0.5))
    var s = agg.zero
    (0 until 200000).foreach(i =>
      s = agg.reduce(s, ((i * 2654435761L) % 1000000).toDouble))
    assert(agg.centroidCount(s) <= 100,
      s"expected <= ~δ/2+slack centroids, got ${agg.centroidCount(s)}")
  }

  test("partitioning changes estimates only within the error bound") {
    val vals = scrambled(80000)
    val a = est(vals, 1, Seq(0.5))
    val b = est(vals, 16, Seq(0.5))
    assert(math.abs(a.head - b.head) <= math.max(a.head, 1.0) * 0.005)
  }

  test("tiny inputs are exact-ish: single value and two values") {
    assert(est(Seq(42.0), 1, Seq(0.5)) == Seq(42.0))
    val two = est(Seq(10.0, 20.0), 1, Seq(0.0, 1.0))
    assert(two.head == 10.0 && two.last == 20.0)
  }
}
