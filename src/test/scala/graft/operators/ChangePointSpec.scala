package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions.col

/** ChangePoint.cusum — closed form ≡ the textbook recursion, alarm
  * semantics, reset behavior. */
class ChangePointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation: the literal Page recursion on the driver,
    * n-scaled exactly like the operator. */
  private def recursion(xs: Seq[BigDecimal], slack: BigDecimal,
      h: BigDecimal): (Long, BigDecimal) = {
    val n = xs.size
    val s = xs.sum
    var cur = BigDecimal(0); var peak = BigDecimal(0); var alarms = 0L
    xs.foreach { x =>
      cur = (cur + n * x - s - n * slack).max(BigDecimal(0))
      peak = peak.max(cur)
      if (cur > n * h) alarms += 1
    }
    (alarms, peak)
  }

  private def run(xs: Seq[Double], slack: String, h: String) = {
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "t", "v")
    ChangePoint.cusum(df, "k", Seq("t"), col("v"),
        BigDecimal(slack), BigDecimal(h))
      .select("n_alarms", "peak_stat", "first_alarm")
      .as[(Long, Double, Option[Long])].head()
  }

  test("closed form matches the textbook recursion on a shifted series") {
    val xs = Seq(1.0, 2.0, 1.5, 9.0, 10.0, 11.0, 1.0, 2.0)
    val (alarms, peak) = recursion(xs.map(BigDecimal(_)),
      BigDecimal("0.50"), BigDecimal("6.00"))
    val (gotAlarms, gotPeak, _) = run(xs, "0.50", "6.00")
    assert(gotAlarms == alarms)
    assert(math.abs(gotPeak - (peak / xs.size).toDouble) < 1e-12)
  }

  test("flat series never alarms and peak stays at zero") {
    val (alarms, peak, first) = run(Seq.fill(10)(5.0), "0.00", "0.50")
    assert(alarms == 0L && peak == 0.0 && first.isEmpty)
  }

  test("first_alarm is the ordering value of the first crossing, and the " +
    "statistic resets to zero after a deep dip") {
    // high early, long dip, high again: the dip floors the statistic at 0
    // (not negative), so the late excursion must rebuild from scratch
    val xs = Seq(20.0, 20.0, 0.0, 0.0, 0.0, 0.0, 0.0, 20.0, 20.0, 0.0)
    val (alarms, _, first) = run(xs, "1.00", "10.00")
    val (refAlarms, _) = recursion(xs.map(BigDecimal(_)),
      BigDecimal("1.00"), BigDecimal("10.00"))
    assert(alarms == refAlarms && alarms > 0)
    assert(first.contains(0L)) // the t=0..1 excursion already crosses
  }

  test("keys are independent") {
    val df = (Seq((1L, 0L, 100.0), (1L, 1L, 100.0)) ++
      (0L to 9L).map(t => (2L, t, 1.0))).toDF("k", "t", "v")
    val out = ChangePoint.cusum(df, "k", Seq("t"), col("v"),
        BigDecimal("0.00"), BigDecimal("1.00"))
      .select("k", "n_alarms").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L) // two equal points: deviations are 0
    assert(out(2L) == 0L)
  }
}
