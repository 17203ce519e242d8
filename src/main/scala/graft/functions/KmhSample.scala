package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded sample buffer: a size-capped max-heap over (hash, key1, key2)
  * sort tuples, stored as parallel primitive arrays (encoder-friendly,
  * zero boxing on the hot path). `n` is the live element count; array
  * capacity grows geometrically to `k` so small groups pay small state. */
case class KmhState(h: Array[Long], k1: Array[Long], k2: Array[Long],
    v: Array[Double], n: Int)

/** K-minimum-hash uniform sample — a BOUNDED, mergeable, deterministic
  * sampling aggregator: keeps the `k` rows whose (hash, key1, key2) sort
  * tuple is smallest, and returns their `value` column.
  *
  * Because the kept set is a pure function of the DATA SET (the k smallest
  * by a total order — no RNG, no partition dependence), the exact same
  * sample is computable in any engine (`row_number() OVER (ORDER BY hash,
  * key1, key2) <= k`), so downstream statistics (quantiles, means) are
  * cross-engine REPLAYABLE — the property approximate sketches with
  * engine-private merge order can never have. With the 60-bit md5 portable
  * hash ([[graft.llm.Dedup.portableWordHash]] family) the tuple is unique
  * whenever (key1, key2) is a row key, so ties cannot drop rows.
  *
  * State: k (long, long, long, double) entries in a max-heap (O(log k)
  * insert, no per-insert array shifting) — ≤ 32·k bytes per group at ANY
  * input size. Insert/merge are order-insensitive set operations
  * (smallest-k of a union), so the aggregation is fully map-side
  * combinable and partitioning-invariant.
  *
  * This is the engine's bounded-memory quantile path: exact `percentile`
  * buffers EVERY group value in one aggregation buffer (the 100 TB
  * memory killer); `sample → exact percentile over ≤ k values` is two
  * bounded aggregations with the same cross-engine determinism. Sampling
  * error for a mid quantile is ~0.5/sqrt(k) in rank (k = 8192 → ~0.6%).
  */
class KmhSample(k: Int)
    extends Aggregator[(Long, Long, Long, Double), KmhState, Array[Double]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: KmhState = KmhState(
    Array.emptyLongArray, Array.emptyLongArray, Array.emptyLongArray,
    Array.emptyDoubleArray, 0)

  private def less(ah: Long, a1: Long, a2: Long,
      bh: Long, b1: Long, b2: Long): Boolean =
    if (ah != bh) ah < bh else if (a1 != b1) a1 < b1 else a2 < b2

  private def lessIdx(s: KmhState, i: Int, j: Int): Boolean =
    less(s.h(i), s.k1(i), s.k2(i), s.h(j), s.k1(j), s.k2(j))

  private def swap(s: KmhState, i: Int, j: Int): Unit = {
    val th = s.h(i); s.h(i) = s.h(j); s.h(j) = th
    val t1 = s.k1(i); s.k1(i) = s.k1(j); s.k1(j) = t1
    val t2 = s.k2(i); s.k2(i) = s.k2(j); s.k2(j) = t2
    val tv = s.v(i); s.v(i) = s.v(j); s.v(j) = tv
  }

  // max-heap on the sort tuple: root = current k-th smallest (the cutoff)
  private def siftUp(s: KmhState, start: Int): Unit = {
    var i = start
    while (i > 0 && lessIdx(s, (i - 1) / 2, i)) {
      swap(s, i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(s: KmhState, start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = l + 1
      var big = i
      if (l < s.n && lessIdx(s, big, l)) big = l
      if (r < s.n && lessIdx(s, big, r)) big = r
      if (big == i) done = true else { swap(s, i, big); i = big }
    }
  }

  private def grown(s: KmhState): KmhState =
    if (s.n < s.h.length) s
    else {
      val cap = math.min(k, math.max(16, s.h.length * 2))
      KmhState(java.util.Arrays.copyOf(s.h, cap),
        java.util.Arrays.copyOf(s.k1, cap), java.util.Arrays.copyOf(s.k2, cap),
        java.util.Arrays.copyOf(s.v, cap), s.n)
    }

  private def insert(s0: KmhState, h: Long, k1: Long, k2: Long,
      v: Double): KmhState =
    if (s0.n < k) {
      val s = grown(s0)
      s.h(s.n) = h; s.k1(s.n) = k1; s.k2(s.n) = k2; s.v(s.n) = v
      val s2 = s.copy(n = s.n + 1)
      siftUp(s2, s2.n - 1)
      s2
    } else if (less(h, k1, k2, s0.h(0), s0.k1(0), s0.k2(0))) {
      s0.h(0) = h; s0.k1(0) = k1; s0.k2(0) = k2; s0.v(0) = v
      siftDown(s0, 0)
      s0
    } else s0

  override def reduce(s: KmhState, in: (Long, Long, Long, Double)): KmhState =
    insert(s, in._1, in._2, in._3, in._4)

  override def merge(a: KmhState, b: KmhState): KmhState = {
    var s = a
    var i = 0
    while (i < b.n) { s = insert(s, b.h(i), b.k1(i), b.k2(i), b.v(i)); i += 1 }
    s
  }

  /** Sampled values, ordered by the sort tuple (deterministic dump order —
    * consumers aggregating the sample don't depend on it). */
  override def finish(s: KmhState): Array[Double] = {
    val idx = Array.range(0, s.n)
      .sortWith((i, j) => lessIdx(s, i, j))
    idx.map(s.v)
  }

  override def bufferEncoder: Encoder[KmhState] = ExpressionEncoder[KmhState]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object KmhSample {
  /** Column form: the values of the k rows smallest by (hash, key1, key2).
    * `hash` should be uniform (e.g. the 60-bit md5 portable hash of the
    * row key); (key1, key2) break hash ties so no row is ever dropped. */
  def sample(hash: Column, key1: Column, key2: Column, value: Column,
      k: Int): Column =
    udaf(new KmhSample(k)).apply(hash, key1, key2, value)
}
