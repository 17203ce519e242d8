package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k buffer: parallel primitive arrays forming a min-heap of
  * the kept set (root = current cutoff — the worst row still kept). */
case class TopKState(v: Array[Double], id: Array[Long], n: Int)

/** One kept row: the id and the value it ranked by. */
case class TopKRow(id: Long, v: Double)

/** Grouped top-k as a BOUNDED, mergeable aggregation (SURVEY §2D, D112).
  *
  * The idiomatic grouped top-k (`row_number() OVER (PARTITION BY g ORDER
  * BY v DESC) <= k`) SORTS every group in full: at 100 TB that is a
  * whole-table sort exchange to rank rows of which all but k per group
  * are discarded. This Aggregator keeps only the k best rows per group
  * under the total order (v DESC, id ASC) in a ≤ 16·k-byte min-heap —
  * O(log k) insert, map-side combinable, partitioning-invariant — so the
  * shuffle carries k rows per (partition, group), never the group.
  *
  * The (v, id) total order makes the kept SET a pure function of the data
  * set (ties on v resolve to the smaller id), so the result is exactly
  * replayable by the window-rank form in any engine — the same
  * determinism contract as [[KmhSample]].
  */
class TopK(k: Int)
    extends Aggregator[(Long, Double), TopKState, Array[TopKRow]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: TopKState =
    TopKState(Array.emptyDoubleArray, Array.emptyLongArray, 0)

  /** true iff (av, ai) ranks STRICTLY AFTER (bv, bi) under (v DESC,
    * id ASC) — i.e. a is the worse row. Heap order: parents are worse. */
  private def worse(av: Double, ai: Long, bv: Double, bi: Long): Boolean =
    if (av != bv) av < bv else ai > bi

  private def worseIdx(s: TopKState, i: Int, j: Int): Boolean =
    worse(s.v(i), s.id(i), s.v(j), s.id(j))

  private def swap(s: TopKState, i: Int, j: Int): Unit = {
    val tv = s.v(i); s.v(i) = s.v(j); s.v(j) = tv
    val ti = s.id(i); s.id(i) = s.id(j); s.id(j) = ti
  }

  private def siftUp(s: TopKState, start: Int): Unit = {
    var i = start
    while (i > 0 && worseIdx(s, i, (i - 1) / 2)) {
      swap(s, i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(s: TopKState, start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < s.n && worseIdx(s, l, w)) w = l
      if (r < s.n && worseIdx(s, r, w)) w = r
      if (w == i) done = true else { swap(s, i, w); i = w }
    }
  }

  private def grown(s: TopKState): TopKState =
    if (s.n < s.v.length) s
    else {
      val cap = math.min(k, math.max(8, s.v.length * 2))
      TopKState(java.util.Arrays.copyOf(s.v, cap),
        java.util.Arrays.copyOf(s.id, cap), s.n)
    }

  private def insert(s0: TopKState, id: Long, v: Double): TopKState =
    if (s0.n < k) {
      val s = grown(s0)
      s.v(s.n) = v; s.id(s.n) = id
      val s2 = s.copy(n = s.n + 1)
      siftUp(s2, s2.n - 1)
      s2
    } else if (worse(s0.v(0), s0.id(0), v, id)) {
      s0.v(0) = v; s0.id(0) = id
      siftDown(s0, 0)
      s0
    } else s0

  override def reduce(s: TopKState, in: (Long, Double)): TopKState =
    insert(s, in._1, in._2)

  override def merge(a: TopKState, b: TopKState): TopKState = {
    var s = a
    var i = 0
    while (i < b.n) { s = insert(s, b.id(i), b.v(i)); i += 1 }
    s
  }

  /** Kept rows best-first: position p is rank p+1 under (v DESC, id ASC). */
  override def finish(s: TopKState): Array[TopKRow] =
    Array.range(0, s.n)
      .sortWith((i, j) => worseIdx(s, j, i))
      .map(i => TopKRow(s.id(i), s.v(i)))

  override def bufferEncoder: Encoder[TopKState] = ExpressionEncoder[TopKState]()
  override def outputEncoder: Encoder[Array[TopKRow]] =
    ExpressionEncoder[Array[TopKRow]]()
}

object TopK {
  /** Column form: the k rows largest by (value DESC, id ASC), best first. */
  def topk(id: Column, value: Column, k: Int): Column =
    udaf(new TopK(k)).apply(id, value)
}
