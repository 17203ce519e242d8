package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D168 — Hilbert index: bijective on the grid, unit-step adjacency (the
  * locality Morton lacks), expression ≡ companion, out-of-range → NULL. */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bits = 5
  private val side = 1 << bits

  test("bijection: every cell of the 32x32 grid gets a distinct index " +
    "covering [0, 1024)") {
    val ds = for { x <- 0L until side; y <- 0L until side }
      yield Hilbert.xy2d(bits, x, y)
    assert(ds.toSet == (0L until (side.toLong * side)).toSet)
  }

  test("unit-step adjacency: consecutive indexes are grid NEIGHBORS — " +
    "true for Hilbert, false for Morton (the whole point of the curve)") {
    def walk(index: (Long, Long) => Long): Seq[Long] = {
      val cells = for { x <- 0L until side; y <- 0L until side }
        yield (index(x, y), (x, y))
      cells.sortBy(_._1).map(_._2).sliding(2).map {
        case Seq((x1, y1), (x2, y2)) =>
          math.abs(x1 - x2) + math.abs(y1 - y2)
      }.toSeq
    }
    val hilbertSteps = walk(Hilbert.xy2d(bits, _, _))
    assert(hilbertSteps.forall(_ == 1L),
      s"max hilbert step ${hilbertSteps.max} — must always be 1")
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(j =>
        (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))).sum
    val mortonSteps = walk(morton)
    assert(mortonSteps.max > 1L,
      "Morton must exhibit the diagonal jumps Hilbert avoids")
  }

  test("codegen'd expression equals the companion function; out-of-range " +
    "and NULL coords index NULL") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)((rnd.nextInt(side).toLong,
      rnd.nextInt(side).toLong)) ++
      Seq((side.toLong, 1L), (-1L, 5L), (3L, side + 7L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Hilbert.hValue2(col("x"), col("y"), bits).as("d"))
      .collect()
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      if (x < 0 || y < 0 || x >= side || y >= side)
        assert(r.isNullAt(2), s"($x,$y) must index NULL")
      else assert(r.getLong(2) == Hilbert.xy2d(bits, x, y))
    }
    val nulls: Seq[(java.lang.Long, java.lang.Long)] = Seq((null, 1L))
    assert(nulls.toDF("x", "y")
      .select(Hilbert.hValue2(col("x"), col("y"), bits)).head().isNullAt(0))
  }
}
