package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions.{col, expr}

/** Seasonal.decompose — exact recovery of a constructed trend+seasonal
  * series, edge-bucket NULLs, additivity. */
class SeasonalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def daily(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, d) => (d.toLong, x) }.toDF("d", "x0")
      .select(col("d"), expr("CAST(x0 AS DECIMAL(18,2))").as("x"))

  test("recovers a pure period-3 seasonal pattern over a flat trend") {
    // x = 10 + s(phase), s = (+1, -2, +1): seasonal means sum to 0 and the
    // moving average of any 3 consecutive = 10 exactly
    val pat = Seq(1.0, -2.0, 1.0)
    val xs = (0 until 9).map(d => 10.0 + pat(d % 3))
    val out = Seasonal.decompose(daily(xs), period = 3)
      .select("d", "phase", "trend", "seasonal", "remainder")
      .as[(Long, Long, Option[Double], Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    out.foreach { case (d, phase, trend, seasonal, rem) =>
      assert(phase == d % 3)
      if (d == 0 || d == 8) assert(trend.isEmpty && rem.isEmpty)
      else {
        assert(trend.contains(10.0))
        assert(rem.contains(0.0))
      }
      assert(seasonal == pat((d % 3).toInt))
    }
  }

  test("linear trend passes through the centered moving average exactly " +
    "and total = trend + seasonal + remainder on interior buckets") {
    val xs = (0 until 14).map(d => 2.0 * d + (if (d % 7 == 2) 5.0 else 0.0))
    val out = Seasonal.decompose(daily(xs), period = 7)
      .select("d", "total", "trend", "seasonal", "remainder")
      .as[(Long, Double, Option[Double], Double, Option[Double])]
      .collect().sortBy(_._1)
    out.filter(_._3.isDefined).foreach { case (d, total, t, s, r) =>
      // centered MA of a linear function is the function itself (+ the
      // seasonal bump's contribution 5/7 in every full window)
      assert(math.abs(t.get - (2.0 * d + 5.0 / 7.0)) < 1e-9)
      assert(math.abs(total - (t.get + s + r.get)) < 1e-9)
    }
    // edges: first 3 and last 3 buckets have no full window
    assert(out.count(_._3.isEmpty) == 6)
  }

  test("even periods are rejected") {
    intercept[IllegalArgumentException] {
      Seasonal.decompose(daily(Seq(1.0, 2.0)), period = 4)
    }
  }
}
