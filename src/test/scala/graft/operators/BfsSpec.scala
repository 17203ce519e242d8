package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BFS hop distances (D114): fixed-round reach, multi-source min, shortcut
  * preference. */
class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
      rounds: Int) =
    Bfs.hops(edges.toDF("a", "b"), "a", "b", sources.toDF("s"), "s", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("round r reaches exactly the r-hop ball; later rounds extend it") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, Seq(1L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(run(path, Seq(1L), rounds = 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // monotone: extra rounds past the eccentricity are no-ops
    assert(run(path, Seq(1L), rounds = 5) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multiple sources take the minimum over sources") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, Seq(1L, 4L), rounds = 1) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("a shortcut edge wins over the long way round") {
    // ring 1-2-3-4-5-1: node 3 is 2 hops either way; with chord (1,3) it's 1
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(run(ring, Seq(1L), rounds = 3)(3L) == 2L)
    assert(run(ring :+ ((1L, 3L)), Seq(1L), rounds = 3)(3L) == 1L)
  }
}
