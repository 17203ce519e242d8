package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** k-core peeling (D113): fixed-round semantics, cascade depth, empty core. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.peel(edges.toDF("a", "b"), "a", "b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pendant node peels, triangle survives as the 2-core") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
    assert(core(g, k = 2, rounds = 3) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k above the densest degree empties the core") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(core(g, k = 3, rounds = 2).isEmpty)
  }

  test("peeling cascades one layer per round on a path (fixed-round " +
    "contract), and enough rounds reach the true (empty) 2-core") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // round 1 peels the endpoints only
    assert(core(path, k = 2, rounds = 1) ==
      Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    assert(core(path, k = 2, rounds = 3).isEmpty)
    // extra rounds past the peel depth are no-ops (monotone)
    assert(core(path, k = 2, rounds = 5).isEmpty)
  }

  test("self-loops and duplicate/reversed edges don't inflate degrees") {
    val g = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
    assert(core(g, k = 2, rounds = 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
