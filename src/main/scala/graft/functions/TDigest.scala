package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** t-digest state: sorted centroid arrays plus an unsorted singleton
  * buffer that amortizes the O(c·log c) compression over many inserts.
  * Both are bounded: centroids by the scale function (≤ ~compression/2 + 2
  * after compression), the buffer by `bufCap`. */
case class TDigestState(mean: Array[Double], weight: Array[Double],
    buf: Array[Double], nBuf: Int)

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019) as a typed Catalyst `Aggregator` —
  * the bounded-memory, fully mergeable quantile sketch beside
  * [[KmvDistinct]] and [[CountMin]] in the engine's sketch family.
  *
  * The k1 scale function k(q) = δ/(2π)·asin(2q−1) caps each centroid's
  * weight so bins are FINE at the tails (singletons at q→0,1) and coarse
  * in the middle — relative rank error stays ~O(1/δ) at mid quantiles and
  * far better at the tails, from a state of at most ~δ/2 centroids
  * regardless of input size. Merge concatenates centroid lists and
  * re-compresses: associative up to sketch error, map-side combinable, a
  * few KB shuffled per group at ANY scale (vs Spark's exact `percentile`
  * whose buffer holds EVERY value of the group).
  *
  * Estimates depend (within the error bound) on merge order, so oracle
  * gating uses a tolerance band against the exact percentile (the
  * q_approx_percentile pattern), not value replay — [[KmhSample]] is the
  * battery's exactly-replayable bounded quantile path.
  */
class TDigest(compression: Double, qs: Array[Double], bufCap: Int = 512)
    extends Aggregator[Double, TDigestState, Array[Double]] {
  require(compression >= 20, s"compression must be >= 20, got $compression")
  require(qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")

  override def zero: TDigestState =
    TDigestState(Array.emptyDoubleArray, Array.emptyDoubleArray,
      new Array[Double](bufCap), 0)

  private val kMax = compression / 4.0 // k(1): asin(1) = π/2

  private def kFn(q: Double): Double = {
    val c = math.min(1.0, math.max(0.0, q))
    compression / (2 * math.Pi) * math.asin(2 * c - 1)
  }

  private def kInv(k: Double): Double = {
    val c = math.min(kMax, math.max(-kMax, k))
    (math.sin(c * 2 * math.Pi / compression) + 1) / 2
  }

  /** Merge (means, weights)[0..n) — ANY order — into a compressed sorted
    * centroid list obeying the k1 size bound. */
  private def compress(ms: Array[Double], ws: Array[Double], n: Int)
      : (Array[Double], Array[Double]) = {
    if (n == 0) return (Array.emptyDoubleArray, Array.emptyDoubleArray)
    val idx = Array.range(0, n).sortBy(ms(_))
    var total = 0.0
    var i = 0
    while (i < n) { total += ws(i); i += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var on = 0
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    var q0 = 0.0
    var qLimit = kInv(kFn(0.0) + 1.0)
    var j = 1
    while (j < n) {
      val m = ms(idx(j)); val w = ws(idx(j))
      if (q0 + (curW + w) / total <= qLimit) {
        curM += (m - curM) * w / (curW + w) // stable weighted-mean update
        curW += w
      } else {
        outM(on) = curM; outW(on) = curW; on += 1
        q0 += curW / total
        qLimit = kInv(kFn(q0) + 1.0)
        curM = m; curW = w
      }
      j += 1
    }
    outM(on) = curM; outW(on) = curW; on += 1
    (java.util.Arrays.copyOf(outM, on), java.util.Arrays.copyOf(outW, on))
  }

  /** Fold the singleton buffer into the centroid list. */
  private def flushed(s: TDigestState): TDigestState =
    if (s.nBuf == 0) s
    else {
      val n = s.mean.length + s.nBuf
      val ms = new Array[Double](n)
      val ws = new Array[Double](n)
      System.arraycopy(s.mean, 0, ms, 0, s.mean.length)
      java.util.Arrays.fill(ws, 1.0)
      System.arraycopy(s.weight, 0, ws, 0, s.weight.length)
      System.arraycopy(s.buf, 0, ms, s.mean.length, s.nBuf)
      val (m2, w2) = compress(ms, ws, n)
      TDigestState(m2, w2, s.buf, 0)
    }

  override def reduce(s0: TDigestState, x: Double): TDigestState = {
    val s = if (s0.nBuf == s0.buf.length) flushed(s0) else s0
    s.buf(s.nBuf) = x
    s.copy(nBuf = s.nBuf + 1)
  }

  override def merge(a0: TDigestState, b0: TDigestState): TDigestState = {
    val a = flushed(a0); val b = flushed(b0)
    val n = a.mean.length + b.mean.length
    if (n == 0) return a
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(a.mean, 0, ms, 0, a.mean.length)
    System.arraycopy(b.mean, 0, ms, a.mean.length, b.mean.length)
    System.arraycopy(a.weight, 0, ws, 0, a.weight.length)
    System.arraycopy(b.weight, 0, ws, a.weight.length, b.weight.length)
    val (m2, w2) = compress(ms, ws, n)
    TDigestState(m2, w2, a.buf, 0)
  }

  /** Midpoint-interpolated quantile over the centroid CDF (each centroid's
    * mass centered at its cumulative midpoint — the reference estimator). */
  private def quantile(m: Array[Double], w: Array[Double], q: Double)
      : Double = {
    val n = m.length
    if (n == 0) return Double.NaN
    if (n == 1) return m(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += w(i); i += 1 }
    val target = q * total
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = m(0)
    i = 0
    while (i < n) {
      val mid = cum + w(i) / 2
      if (target < mid) {
        if (i == 0) return m(0)
        return prevMean + (m(i) - prevMean) * (target - prevMid) / (mid - prevMid)
      }
      cum += w(i); prevMid = mid; prevMean = m(i)
      i += 1
    }
    m(n - 1)
  }

  override def finish(s0: TDigestState): Array[Double] = {
    val s = flushed(s0)
    qs.map(q => quantile(s.mean, s.weight, q))
  }

  /** Exposed for spec assertions: centroid count after compressing `s`. */
  def centroidCount(s: TDigestState): Int = flushed(s).mean.length

  override def bufferEncoder: Encoder[TDigestState] =
    ExpressionEncoder[TDigestState]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object TDigest {
  /** Column form: t-digest estimates of `qs` quantiles of `value`. */
  def quantiles(value: Column, compression: Double, qs: Seq[Double]): Column =
    udaf(new TDigest(compression, qs.toArray)).apply(value)
}
