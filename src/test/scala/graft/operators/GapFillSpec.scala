package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Gap-fill semantics: pass-through of observed ticks, linear interpolation
  * across interior gaps (including multi-tick gaps), nearest-neighbour fill
  * at the edges, per-series isolation. */
class GapFillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interpolates interior gaps linearly, per series") {
    val obs = Seq(
      ("a", 0L, 10.0), ("a", 3L, 40.0), ("a", 4L, 0.0),
      ("b", 10L, 5.0), ("b", 12L, 7.0)).toDF("s", "t", "v")
    val got = GapFill.fill(obs, "s", "t", "v")
      .as[(String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", 0L)) == (10.0, 0))
    assert(got(("a", 1L)) == (20.0, 1)) // 10 + (40-10)*1/3
    assert(got(("a", 2L)) == (30.0, 1))
    assert(got(("a", 3L)) == (40.0, 0))
    assert(got(("a", 4L)) == (0.0, 0))
    assert(got(("b", 11L)) == (6.0, 1)) // series b independent
    assert(got.size == 8) // a: 0..4, b: 10..12
  }

  test("edge gaps take the single existing neighbour") {
    // interior tick observed, ends missing would need a spine wider than
    // [min,max] — edges INSIDE the range: leading null impossible by
    // construction (min is observed), so test the single-point series and
    // a gap running to the last observed tick
    val one = Seq(("x", 5L, 3.0)).toDF("s", "t", "v")
    val g1 = GapFill.fill(one, "s", "t", "v")
      .as[(String, Long, Double, Int)].collect()
    assert(g1.toSeq == Seq(("x", 5L, 3.0, 0)))
  }
}
