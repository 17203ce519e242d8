package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Capped co-occurrence projection (D118): cap determinism, weight
  * accumulation, membership dedup. */
class CooccurSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], cap: Int) =
    Cooccur.project(rows.toDF("g", "i"), "g", "i", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("weights count co-membership across groups") {
    val m = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (2L, 30L))
    assert(run(m, cap = 8) ==
      Map((10L, 20L) -> 2L, (10L, 30L) -> 1L, (20L, 30L) -> 1L))
  }

  test("a degenerate group caps to its smallest items: C(cap,2) pairs") {
    val hot = (1L to 100L).map(i => (1L, i))
    val out = run(hot, cap = 4)
    assert(out.size == 6) // C(4,2)
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
  }

  test("repeated (group, item) memberships count once") {
    val m = Seq((1L, 10L), (1L, 10L), (1L, 20L))
    assert(run(m, cap = 8) == Map((10L, 20L) -> 1L))
  }
}
