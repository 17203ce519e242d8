package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** QuantileNorm — same within-source rank → same global value, whatever
  * the source's raw scale. */
class QuantileNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two sources on wildly different scales normalize to the SAME " +
    "global values rank-for-rank") {
    // source a: 1..4, source b: 101..104 — a's k-th smallest and b's
    // k-th smallest sit at the same within-source percentile, so both
    // must land on the same global breakpoint value
    val df = (Seq.tabulate(4)(i => (i.toLong, "a", (i + 1).toLong)) ++
      Seq.tabulate(4)(i => (10L + i, "b", (101 + i).toLong)))
      .toDF("id", "src", "v")
    val out = QuantileNorm.normalize(df, "src", "v", "id", b = 8)
      .select("src", "v", "norm").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val a = out.filter(_._1 == "a").map(_._3)
    val b = out.filter(_._1 == "b").map(_._3)
    assert(a == b, s"rank-matched norms differ: $a vs $b")
    // norms are actual global values, monotone in rank
    assert(a == a.sorted && a.toSet.subsetOf(Set(1L, 2L, 3L, 4L, 101L,
      102L, 103L, 104L)))
  }

  test("b >= 2 is enforced and every row keeps exactly one norm") {
    val df = Seq((1L, "a", 5L), (2L, "a", 6L)).toDF("id", "src", "v")
    intercept[IllegalArgumentException](
      QuantileNorm.normalize(df, "src", "v", "id", b = 1))
    assert(QuantileNorm.normalize(df, "src", "v", "id").count() == 2)
  }
}
