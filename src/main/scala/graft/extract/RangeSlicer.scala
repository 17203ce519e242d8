package graft.extract

/** One half-open extraction slice `col >= lo AND col < hi`. */
final case class Slice(lo: Long, hi: Long)

/** Range-partitioned full scan slicing (SURVEY A6).
  *
  * Reference semantics (extract_data.py:997-1024, 1127-1159;
  * query_generator.py:132-168): probe MIN/MAX(partition_column), then split
  * [min, max] into N contiguous slices with `>= lo AND < hi` bounds where the
  * last slice's upper bound is max+1, N = min(maxPartitions=30, range).
  *
  * The slices form an exact, non-overlapping cover of [min, max] (tested by
  * property in RangeSlicerSpec). This is precisely the contract of Spark's
  * JDBC partitioned read (partitionColumn/lowerBound/upperBound/numPartitions)
  * — at 100 TB these slices map 1:1 to parallel source reads.
  */
object RangeSlicer {
  val DefaultMaxPartitions = 30

  def slices(min: Long, max: Long,
      maxPartitions: Int = DefaultMaxPartitions): Seq[Slice] = {
    require(max >= min, s"max $max < min $min")
    val range = max - min + 1
    val n = math.min(maxPartitions.toLong, range).toInt
    // ceil-based proportional boundaries: exact cover of [min, max+1) AND
    // consistent with sliceOf's floor((v-min)*n/range) assignment
    def bound(i: Int): Long = min + (range * i + n - 1) / n
    (0 until n).map(i => Slice(bound(i), bound(i + 1)))
  }

  /** Slice index of a value v in [min, max] under the same boundaries —
    * the expression-level twin of `slices` used for local-mode partitioned
    * reads (and the oracle query). */
  def sliceOf(v: Long, min: Long, max: Long,
      maxPartitions: Int = DefaultMaxPartitions): Int = {
    val range = max - min + 1
    val n = math.min(maxPartitions.toLong, range)
    (((v - min) * n) / range).toInt
  }
}
