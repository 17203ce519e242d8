package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed Catalyst
  * `Aggregator` — the custom-aggregation rung of the extension ladder
  * (a scalar/agg function Spark lacks; HLL++ exists built-in, but KMV is
  * the sketch whose estimate is a pure DETERMINISTIC function of the hash
  * set, so the exact same estimate is computable in any engine — our
  * oracle recomputes it in SQL and the values hash-match, something
  * approx_count_distinct can never do cross-engine).
  *
  * State: the k smallest DISTINCT hash values (sorted array, bounded at k
  * longs). Insert/merge are set operations, so aggregation order and
  * partitioning cannot change the result — fully mergeable, map-side
  * combinable, 8k bytes of state per group at any scale.
  *
  * Estimator: with hashes uniform in [0, P), the k-th smallest distinct
  * value x_(k) estimates n ≈ (k−1)·P / x_(k); fewer than k distinct
  * hashes means the sketch IS the exact distinct count.
  */
class KmvDistinct(k: Int, normalizer: Double)
    extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(buf: Array[Long], h: Long): Array[Long] =
    KmvDistinct.insert(buf, h, k)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble / (buf.last.toDouble / normalizer)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** KMV sketch STATE as the aggregation result — the storable form for
  * incremental distinct maintenance (D120): persist the per-key k-min
  * array, merge each delta's states in, estimate on read. State set
  * algebra makes merge ≡ rebuild exactly. */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    KmvDistinct.insert(buf, h, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)((s, h) => KmvDistinct.insert(s, h, k))
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Merge STORED KMV states (k-smallest-distinct of the union) — the
  * delta-absorbing aggregation of the distinct rollup. */
class KmvMerge(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], st: Array[Long]): Array[Long] =
    (if (st == null) buf
     else st.foldLeft(buf)((s, h) => KmvDistinct.insert(s, h, k)))
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)((s, h) => KmvDistinct.insert(s, h, k))
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KmvDistinct {
  /** Column-level KMV estimate over a pre-hashed Long column whose values
    * are uniform in [0, normalizer). */
  def kmv(hashCol: Column, k: Int, normalizer: Double): Column =
    udaf(new KmvDistinct(k, normalizer)).apply(hashCol)

  /** Sorted insert keeping the k smallest DISTINCT values. */
  private[graft] def insert(buf: Array[Long], h: Long,
      k: Int): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // already present — KMV tracks DISTINCT minima
    else {
      val ins = -idx - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  /** Storable per-group sketch state (k-min distinct hash array). */
  def sketch(hashCol: Column, k: Int): Column =
    udaf(new KmvSketch(k)).apply(hashCol)

  /** Merge a column of STORED states into one per group. */
  def mergeStates(stateCol: Column, k: Int): Column =
    udaf(new KmvMerge(k)).apply(stateCol)

  /** Estimate from a stored state column (same estimator as [[kmv]]). */
  def estimate(stateCol: Column, k: Int, normalizer: Double): Column = {
    import org.apache.spark.sql.functions._
    when(size(stateCol) < k, size(stateCol).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(stateCol, k).cast("double") / normalizer))
  }
}
