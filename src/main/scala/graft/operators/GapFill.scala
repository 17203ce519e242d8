package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap-fill with linear interpolation.
  *
  * Input: one row per (series, tick) for OBSERVED ticks. Output: one row per
  * (series, tick) for EVERY tick in the series' [min, max] range — observed
  * values pass through, missing ticks are linearly interpolated between the
  * nearest observed neighbours, and edge gaps (before the first / after the
  * last observation) take the single existing neighbour.
  *
  * Scale shape: the spine is generated per-series from one small aggregate
  * (`sequence(min, max)` explodes executor-side — the driver never sees
  * ticks), and both interpolation windows are PARTITIONED BY the series key,
  * so each series fills in parallel with no global sort. Dense-but-gappy
  * 100 TB telemetry fills at shuffle cost ~2× the observed rows.
  *
  * No reference analogue (its pipelines carry business snapshots, not
  * series) — §2D beyond-reference operator.
  */
object GapFill {

  /** @param df       observations: exactly one row per (series, tick)
    * @param series   series key column (window partition key)
    * @param tick     integral tick column (hour number, day number, …)
    * @param value    numeric value column
    * @return (series, tick, filled, was_gap 0/1) for every tick in range
    */
  def fill(df: DataFrame, series: String, tick: String,
      value: String): DataFrame = {
    val spine = df.groupBy(series)
      .agg(min(tick).as("lo"), max(tick).as("hi"))
      .select(col(series), explode(sequence(col("lo"), col("hi"))).as(tick))
    val wPrev = Window.partitionBy(series).orderBy(tick)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(series).orderBy(tick)
      .rowsBetween(0, Window.unboundedFollowing)
    val v = col(value)
    spine.join(df.select(col(series), col(tick), v), Seq(series, tick), "left")
      .withColumn("pv", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(v.isNotNull, col(tick)),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(v, ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when(v.isNotNull, col(tick)),
        ignoreNulls = true).over(wNext))
      .select(col(series), col(tick),
        when(v.isNotNull, v)
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col(tick) - col("ph")) / (col("nh") - col("ph")))
          .as("filled"),
        when(v.isNull, 1).otherwise(0).as("was_gap"))
  }
}
