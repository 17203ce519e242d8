package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing — the gaps-and-islands MERGE (SURVEY §2D): given
  * per-key [start, end] intervals, union overlapping/touching ones into
  * maximal islands. The classic questions it answers — total covered
  * time per user/machine (uptime, watch time, active session coverage),
  * distinct busy periods, longest stretch — are all wrong if computed by
  * naive sum(end-start) whenever intervals overlap.
  *
  * Algorithm (public gaps-and-islands form): order each key's intervals
  * by start, carry the running max of end over STRICTLY PRECEDING rows;
  * a row whose start exceeds that running max opens a new island; the
  * island id is the running count of opens. Two window passes + one
  * aggregation, all over the SAME key partitioning — exactly one
  * key-keyed exchange end-to-end, no self-join (the O(n²) overlap-join
  * formulation this replaces), state bounded per key by the window frame.
  * Touching intervals (start == prior end) merge: coverage is measured
  * on the closed union.
  */
object Intervals {

  /** Maximal merged islands per key: (key, island, i_start, i_end,
    * n_merged). Inputs are long-typed start/end (nanos, seconds — any
    * consistent unit); rows with end < start are rejected upstream by
    * the caller's contract (they would silently shrink coverage). */
  def coalesce(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val order = Seq(col(startCol).asc, col(endCol).asc)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pmax", max(col(endCol)).over(wPrev))
      .withColumn("__open",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__open")).over(wRun))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("i_start"), max(col(endCol)).as("i_end"),
        count(lit(1)).as("n_merged"))
  }

  /** Per-key coverage summary over the merged islands: interval count,
    * island count, total covered units, longest island. */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame =
    coalesce(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(sum(col("n_merged")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered"),
        max(col("i_end") - col("i_start")).as("longest"))
}
