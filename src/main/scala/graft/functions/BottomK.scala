package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded bottom-k buffer: parallel primitive arrays forming a max-heap
  * of the kept set (root = current cutoff — the worst row still kept,
  * i.e. the LARGEST under the ascending order). */
case class BottomKState(v: Array[Long], id: Array[Long], n: Int)

/** One kept row: the id and the (long) value it ranked by. */
case class BottomKRow(id: Long, v: Long)

/** Grouped bottom-k as a BOUNDED, mergeable aggregation — [[TopK]]'s
  * (D112) discipline flipped to the ascending order (v ASC, id ASC) and
  * exact LONG keys (a 60-bit hash does not round-trip through Double:
  * 2^60 > 2^53, so the TopK-with-negated-value trick would corrupt the
  * order on close hashes).
  *
  * The motivating consumer is the D213 cluster-quota pre-filter: the
  * naive `row_number() OVER (PARTITION BY cid ORDER BY hash)` ships a
  * dominant cluster's EVERY row into one task's sort before the quota
  * filter drops all but k of them — at 100 TB a boilerplate-flooded
  * cluster is a single-task O(cluster) sort. This Aggregator's partial
  * (map-side) heaps bound the shuffle to k rows per (map partition,
  * group); the reduce merge touches ≤ k·partitions rows per group, never
  * the group.
  *
  * The (v, id) total order makes the kept SET a pure function of the
  * data set, exactly replayable by the ascending window-rank form in any
  * engine — the same determinism contract as [[TopK]]/[[KmhSample]].
  */
class BottomK(k: Int)
    extends Aggregator[(Long, Long), BottomKState, Array[BottomKRow]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: BottomKState =
    BottomKState(Array.emptyLongArray, Array.emptyLongArray, 0)

  /** true iff (av, ai) ranks STRICTLY AFTER (bv, bi) under (v ASC,
    * id ASC) — i.e. a is the worse row. Heap order: parents are worse. */
  private def worse(av: Long, ai: Long, bv: Long, bi: Long): Boolean =
    if (av != bv) av > bv else ai > bi

  private def worseIdx(s: BottomKState, i: Int, j: Int): Boolean =
    worse(s.v(i), s.id(i), s.v(j), s.id(j))

  private def swap(s: BottomKState, i: Int, j: Int): Unit = {
    val tv = s.v(i); s.v(i) = s.v(j); s.v(j) = tv
    val ti = s.id(i); s.id(i) = s.id(j); s.id(j) = ti
  }

  private def siftUp(s: BottomKState, start: Int): Unit = {
    var i = start
    while (i > 0 && worseIdx(s, i, (i - 1) / 2)) {
      swap(s, i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(s: BottomKState, start: Int): Unit = {
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

  private def grown(s: BottomKState): BottomKState =
    if (s.n < s.v.length) s
    else {
      val cap = math.min(k, math.max(8, s.v.length * 2))
      BottomKState(java.util.Arrays.copyOf(s.v, cap),
        java.util.Arrays.copyOf(s.id, cap), s.n)
    }

  private def insert(s0: BottomKState, id: Long, v: Long): BottomKState =
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

  override def reduce(s: BottomKState, in: (Long, Long)): BottomKState =
    insert(s, in._1, in._2)

  override def merge(a: BottomKState, b: BottomKState): BottomKState = {
    var s = a
    var i = 0
    while (i < b.n) { s = insert(s, b.id(i), b.v(i)); i += 1 }
    s
  }

  /** Kept rows best-first: position p is rank p+1 under (v ASC, id ASC). */
  override def finish(s: BottomKState): Array[BottomKRow] =
    Array.range(0, s.n)
      .sortWith((i, j) => worseIdx(s, j, i))
      .map(i => BottomKRow(s.id(i), s.v(i)))

  override def bufferEncoder: Encoder[BottomKState] =
    ExpressionEncoder[BottomKState]()
  override def outputEncoder: Encoder[Array[BottomKRow]] =
    ExpressionEncoder[Array[BottomKRow]]()
}

object BottomK {
  /** Column form: the k rows smallest by (value ASC, id ASC), best first. */
  def bottomk(id: Column, value: Column, k: Int): Column =
    udaf(new BottomK(k)).apply(id, value)
}
