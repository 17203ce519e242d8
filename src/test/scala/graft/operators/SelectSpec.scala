package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** D128 — exact histogram selection: equals the sorted-array answer for
  * every k, across wide domains (multi-round narrowing), heavy duplicates
  * (range collapse), negatives, and the rank edges. */
class SelectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(values: Seq[Long], ks: Seq[Long]): Unit = {
    val df = values.toDF("v")
    val sorted = values.sorted
    ks.foreach { k =>
      val got = Select.kthLong(df, "v", k, buckets = 64)
      assert(got == sorted((k - 1).toInt),
        s"k=$k: got $got, want ${sorted((k - 1).toInt)}")
    }
  }

  test("matches the sorted answer on a wide 2^40 domain (multi-round)") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(500)(rnd.nextLong() % (1L << 40))
    check(vs, Seq(1L, 13L, 250L, 251L, 499L, 500L))
  }

  test("heavy duplicates collapse the range, ranks stay exact") {
    val vs = Seq.fill(300)(42L) ++ Seq.fill(100)(-5L) ++ Seq(7L, 7L, 100L)
    check(vs, Seq(1L, 100L, 101L, 102L, 103L, 402L, 403L))
  }

  test("negatives and k bounds") {
    check(Seq(-10L, -3L, 0L, 5L, 5L, 99L), Seq(1L, 3L, 5L, 6L))
    intercept[IllegalArgumentException] {
      Select.kthLong(Seq(1L).toDF("v"), "v", 2L)
    }
  }

  test("full 64-bit domain (span > Long.MaxValue) stays on the bounded " +
    "histogram path and answers exactly — the hash-column shape") {
    // raw nextLong: lo near MinValue, hi near MaxValue, so hi - lo wraps
    // negative without the split-at-zero guard and the operator degrades
    // to collecting every distinct value
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(400)(rnd.nextLong()) ++
      Seq(Long.MinValue, Long.MaxValue, -1L, 0L)
    check(vs, Seq(1L, 2L, 200L, 201L, 403L, 404L))
  }

  test("percentileLong nearest-rank matches the direct definition") {
    val vs = (1L to 1000L).toSeq
    val df = vs.toDF("v")
    assert(Select.percentileLong(df, "v", 0.5) == 500L)
    assert(Select.percentileLong(df, "v", 0.9) == 900L)
    assert(Select.percentileLong(df, "v", 1.0) == 1000L)
    assert(Select.percentileLong(df, "v", 0.001) == 1L)
  }
}
