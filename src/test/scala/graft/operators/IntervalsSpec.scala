package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Intervals.coalesce / coverage — gaps-and-islands boundary behavior. */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    Intervals.coalesce(rows.toDF("k", "s", "e"), "k", "s", "e")
      .select("k", "i_start", "i_end", "n_merged")
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  test("overlapping intervals merge; a gap opens a new island") {
    val out = run(Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 25L, 30L)))
    assert(out == Seq((1L, 0L, 20L, 2L), (1L, 25L, 30L, 1L)))
  }

  test("touching intervals (start == prior end) merge — closed union") {
    assert(run(Seq((1L, 0L, 10L), (1L, 10L, 15L))) ==
      Seq((1L, 0L, 15L, 2L)))
  }

  test("a contained interval neither extends nor splits its island, and " +
    "the running max survives an early long interval") {
    // [0,100] swallows [10,20] AND [30,40]; naive lag(end) would reopen
    // at 30 because the PREVIOUS row's end is 20 — the running max is
    // what makes this one island
    assert(run(Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L))) ==
      Seq((1L, 0L, 100L, 3L)))
  }

  test("keys are independent; coverage sums islands not raw spans") {
    val cov = Intervals.coverage(
      Seq((1L, 0L, 10L), (1L, 5L, 20L), (2L, 0L, 5L), (2L, 50L, 60L))
        .toDF("k", "s", "e"), "k", "s", "e")
      .select("k", "n_intervals", "n_islands", "covered", "longest")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // key 1: one island [0,20] → covered 20 (NOT 10+15=25)
    assert(cov == Seq((1L, 2L, 1L, 20L, 20L), (2L, 2L, 2L, 15L, 10L)))
  }

  test("duplicate identical intervals collapse into one island") {
    assert(run(Seq((1L, 3L, 7L), (1L, 3L, 7L), (1L, 3L, 7L))) ==
      Seq((1L, 3L, 7L, 3L)))
  }

  test("property: coverage equals the brute-force point union on " +
    "deterministic pseudo-random interval sets") {
    // LCG-generated intervals over a small integer domain: the covered
    // length must equal |union of closed integer point sets| - islands
    // (each closed island [s,e] covers e-s units); islands must equal
    // the number of connected runs in the point union
    var seed = 12345L
    def next(bound: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 33, bound.toLong)
    }
    val rows = (1 to 3).flatMap { k =>
      (1 to 40).map { _ =>
        val s = next(200); (k.toLong, s, s + 1 + next(15))
      }
    }
    val got = Intervals.coverage(rows.toDF("k", "s", "e"), "k", "s", "e")
      .select("k", "n_islands", "covered")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (k, ivs) =>
        // brute force: mark every covered unit [x, x+1) for x in [s, e)
        val pts = ivs.flatMap { case (_, s, e) => s until e }.toSet
        // runs of consecutive covered units, allowing zero-length
        // islands (s == e) that touch nothing
        val zero = ivs.filter { case (_, s, e) => s == e }
          .map { case (_, s, _) => s }
          .filterNot(s => pts.contains(s) || pts.contains(s - 1)).toSet
        val runs =
          if (pts.isEmpty) zero.size.toLong
          else pts.toSeq.sorted.foldLeft((0L, Long.MinValue)) {
            case ((n, prev), x) =>
              (if (x == prev + 1) n else n + 1, x)
          }._1 + zero.size
        (k, runs, pts.size.toLong)
    }
    assert(got == expected)
  }
}
