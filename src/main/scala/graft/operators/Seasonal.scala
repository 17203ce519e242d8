package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Classical periodic (moving-average) seasonal decomposition — the
  * additive trend/seasonal/remainder split every metrics stack runs on
  * daily series (the "classical decomposition" of Kendall & Stuart;
  * STL's simpler ancestor, chosen here because it is fully declarative).
  *
  * Input is an already-aggregated series (one row per bucket `d`, exact
  * DECIMAL measure `x`) — at 100 TB the raw→daily rollup is the only big
  * scan, is map-side combinable, and the decomposition then runs on
  * |days| rows: effectively free, and window width is the PERIOD, never
  * the data.
  *
  * Arithmetic discipline: the engine keeps everything SCALED-EXACT —
  * trend is carried as the length-P window SUM (no division), the
  * detrended series as `P·x − trendSum`, the seasonal component as the
  * per-phase detrended SUM plus its count. The per-row output divides
  * each exact decimal by its exact integer denominator as ONE IEEE
  * double division in a fixed order, so any engine replays the doubles
  * bit-for-bit (the D125/D128 discipline).
  *
  * Centered window: for odd P, rows −(P−1)/2 .. +(P−1)/2; edge buckets
  * with fewer than P neighbors have NULL trend (and don't contribute to
  * seasonal means), the standard convention.
  */
object Seasonal {

  /** Per-bucket decomposition: (d, phase, total, trend, seasonal,
    * remainder) — trend/seasonal/remainder NULL on edge buckets.
    *
    * @param daily one row per bucket: `d` integral bucket id (phase =
    *              d mod period), `x` exact DECIMAL measure
    * @param period seasonality period in buckets (odd, e.g. 7 for
    *               day-of-week on daily buckets)
    */
  def decompose(daily: DataFrame, period: Int): DataFrame = {
    require(period % 2 == 1, s"period must be odd, got $period")
    val half = (period - 1) / 2
    val w = Window.orderBy("d").rowsBetween(-half, half)
    val detr = daily
      .withColumn("phase", F.pmod(F.col("d"), F.lit(period.toLong)))
      .withColumn("win_n", F.count(F.lit(1)).over(w))
      .withColumn("trend_sum",
        F.when(F.col("win_n") === period, F.sum(F.col("x")).over(w)))
      .withColumn("det_scaled",
        F.lit(period) * F.col("x") - F.col("trend_sum"))

    val seasonal = detr.filter(F.col("det_scaled").isNotNull)
      .groupBy("phase")
      .agg(F.sum(F.col("det_scaled")).as("phase_sum"),
        F.count(F.lit(1)).as("phase_n"))

    detr.join(F.broadcast(seasonal), Seq("phase"), "left")
      .select(F.col("d"), F.col("phase"),
        F.col("x").cast("double").as("total"),
        (F.col("trend_sum").cast("double") / F.lit(period.toDouble))
          .as("trend"),
        (F.col("phase_sum").cast("double") /
          (F.lit(period.toLong) * F.col("phase_n")).cast("double"))
          .as("seasonal"),
        F.when(F.col("det_scaled").isNotNull,
          (F.col("det_scaled").cast("double") / F.lit(period.toDouble)) -
            (F.col("phase_sum").cast("double") /
              (F.lit(period.toLong) * F.col("phase_n")).cast("double")))
          .as("remainder"))
  }
}
