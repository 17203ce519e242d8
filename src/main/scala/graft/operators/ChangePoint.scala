package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** One-sided CUSUM change-point detection (Page 1954) over per-key ordered
  * series — the sequential drift monitor a data-quality plane runs on every
  * metric stream (the reference logs per-table row counts and statuses on
  * each run, `/root/reference/artifacts/aws-glue/code/stage/
  * light_transform.py` run-log writes; CUSUM is the standard alarm on top).
  *
  * The textbook statistic is the recursion `S_i = max(0, S_{i-1} + x_i − μ
  * − k)` — order-dependent and seemingly demanding an iterative loop. It
  * has a closed form over prefix sums: with `d_i = x_i − μ − k` and
  * `P_i = Σ_{j≤i} d_j`, `S_i = P_i − min(0, min_{j≤i} P_j)` — so the whole
  * detector is TWO window functions over one per-key partitioning (prefix
  * sum + running min): one exchange, no recursion, no UDAF, scales to any
  * key count.
  *
  * Arithmetic discipline: the recursion runs SCALED BY n (per-key row
  * count) so the baseline mean μ = S/n never needs a division —
  * `n·d_i = n·x_i − S − n·k` is exact DECIMAL arithmetic end-to-end
  * (values enter as DECIMAL(18,2)), and any SQL engine replays the flags
  * and statistics bit-for-bit. Only the REPORTED peak statistic divides by
  * n, one IEEE double division at the very end.
  */
object ChangePoint {

  /** Per-key CUSUM summary: excursions above `h`, peak statistic, first
    * alarm position.
    *
    * @param df    input rows
    * @param key   partition key column
    * @param ord   ordering columns (must be a deterministic total order
    *              within each key)
    * @param value measured column (cast to DECIMAL(18,2) internally)
    * @param slack per-observation slack k, in value units (typically σ/2)
    * @param h     alarm threshold, in value units (typically 3–5 σ)
    */
  def cusum(df: DataFrame, key: String, ord: Seq[String], value: Column,
      slack: BigDecimal, h: BigDecimal): DataFrame = {
    val d2 = DecimalType(18, 2)
    val byKey = Window.partitionBy(key)
    val run = Window.partitionBy(key).orderBy(ord.map(F.col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val scaled = df
      .withColumn("x", value.cast(d2))
      .withColumn("n", F.count(F.lit(1)).over(byKey))
      .withColumn("s", F.sum(F.col("x")).over(byKey))
      // n·d_i, exact decimal; k scaled by n too
      .withColumn("nd",
        F.col("n") * F.col("x") - F.col("s") -
          F.col("n") * F.lit(slack.underlying).cast(d2))
      .withColumn("p", F.sum(F.col("nd")).over(run))
      .withColumn("m", F.least(F.lit(0).cast(d2), F.min(F.col("p")).over(run)))
      .withColumn("stat", F.col("p") - F.col("m"))
      .withColumn("alarm",
        F.col("stat") > F.col("n") * F.lit(h.underlying).cast(d2))

    scaled.groupBy(F.col(key), F.col("n"))
      .agg(
        F.sum(F.when(F.col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        F.max(F.col("stat")).as("peak_scaled"),
        F.min(F.when(F.col("alarm"), F.col(ord.head))).as("first_alarm"))
      .select(F.col(key), F.col("n_alarms"),
        (F.col("peak_scaled").cast("double") / F.col("n").cast("double"))
          .as("peak_stat"),
        F.col("first_alarm"))
  }
}
