package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D239 — binned point-in-interval join: exactly the BETWEEN matches,
  * each emitted once (bin-spanning intervals included), inclusive
  * bounds, degenerate intervals dropped, keys respected, and the plan
  * is an equi-join at any bin width. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches equal the brute-force BETWEEN join, once each, across " +
    "bin widths (spanning, inclusive-bound, degenerate, keyed cases)") {
    val points = Seq(
      (1L, 0L, 100L), (1L, 10L, 101L), (1L, 25L, 102L), (1L, 40L, 103L),
      (2L, 10L, 200L)).toDF("k", "t", "pid")
    val intervals = Seq(
      (1L, 0L, 10L),   // inclusive both ends: catches t=0 AND t=10
      (1L, 5L, 38L),   // spans several small bins
      (1L, 40L, 40L),  // zero-length: catches exactly t=40
      (1L, 30L, 20L),  // degenerate s > e: matches nothing
      (2L, 0L, 50L)    // other key: must not see key-1 points
    ).toDF("k", "s", "e")
    val brute = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("k", "t", "pid", "s", "e")
      .collect().map(_.toSeq).sorted(Ordering.by((x: Seq[Any]) =>
        x.mkString(",")))
    for (w <- Seq(1L, 7L, 64L)) {
      val got = IntervalJoin.pointInInterval(points, intervals,
          Seq("k"), "t", "s", "e", binWidth = w)
        .select("k", "t", "pid", "s", "e")
        .collect().map(_.toSeq).sorted(Ordering.by((x: Seq[Any]) =>
          x.mkString(",")))
      assert(got.toSeq == brute.toSeq,
        s"binWidth=$w must reproduce the brute-force join exactly")
    }
    // sanity on the fixture: inclusive bounds + zero-length both match
    assert(brute.exists(r => r(1) == 10L && r(3) == 0L))
    assert(brute.exists(r => r(1) == 40L && r(3) == 40L))
    assert(!brute.exists(r => r(3) == 30L))
  }

  test("negative timestamps bin correctly (floor, not truncate-toward-" +
    "zero)") {
    val points = Seq((1L, -5L, 1L)).toDF("k", "t", "pid")
    val intervals = Seq((1L, -10L, -1L)).toDF("k", "s", "e")
    assert(IntervalJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "s", "e", binWidth = 7L).count() == 1L)
  }
}
