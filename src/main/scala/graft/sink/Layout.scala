package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout clustering — the Parquet-fallback twin of Delta
  * `OPTIMIZE ZORDER BY` (the reference's table-maintenance surface,
  * light_transform.py:1394-1409, runs OPTIMIZE on every write).
  *
  * Z-ordering interleaves the bits of two clustering keys so rows close in
  * EITHER dimension land in the same files; per-file min/max footer stats
  * then prune scans filtered on either key. At 100 TB this is the difference
  * between "a y-filter reads every file" (single-key sort layout) and "a
  * y-filter reads ~sqrt(files)" — data skipping without an index.
  *
  * Everything is built-in Column arithmetic (shift/and/or — codegen'd,
  * oracle-replayable); the write is repartitionByRange + sortWithinPartitions
  * on the z-value, so file boundaries are range-disjoint in z.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative integral columns:
    * bit j of `x` lands at position 2j, bit j of `y` at 2j+1. The classic
    * Morton (Z) curve — pure integer arithmetic, identical in any engine. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on (xCol, yCol) into `numFiles`
    * range-disjoint files. The z column is computed, used for the range
    * repartition + intra-file sort, and pruned from the output. */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int = 16, numFiles: Int = 32): Unit = {
    val z = zValue2(col(xCol), col(yCol), bits)
    val clustered = df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    clustered.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Per-file (min, max) of `column` (cast to long) — the data-skipping
    * index Delta keeps in its log, surfaced as a manifest table for the
    * Parquet fallback (D107). ONE scan of only the stat column; at 100 TB
    * this runs once per write (like OPTIMIZE's stats collection), not per
    * query. */
  def fileRanges(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column).cast("long")).as("mn"),
        max(col(column).cast("long")).as("mx"))

  /** Range-predicate read that SKIPS files whose [min, max] cannot
    * intersect [lo, hi]: the manifest is collected driver-side (file-count
    * rows — the same size class as Delta's log replay) and the surviving
    * file list feeds the scan. Callers still apply the residual row filter;
    * skipping is file-granular. Returns (dataframe, filesRead, filesTotal). */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val ranges = fileRanges(spark, path, column).collect()
    val keep = ranges.collect {
      case r if !r.isNullAt(1) && !(r.getLong(2) < lo || r.getLong(1) > hi) =>
        r.getString(0)
    }
    val df =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(lit(false)) // typed empty
      else spark.read.parquet(keep: _*)
    (df, keep.length, ranges.length)
  }
}
