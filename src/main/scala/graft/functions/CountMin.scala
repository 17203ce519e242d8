package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Count-min sketch as a typed Catalyst `Aggregator` — bounded-state
  * frequency estimation for heavy-hitter mining over unbounded key domains.
  *
  * State: a d×w counter matrix flattened to `Array[Long]` (d·w·8 bytes per
  * group at ANY corpus size). `reduce` increments one counter per hash row;
  * `merge` is element-wise sum — fully associative/commutative, so map-side
  * combine applies and the whole corpus reduces to ONE 2 KB row. Estimate
  * for key x = min over rows i of counter[i][bucket_i(x)]: an upper bound
  * on the true count that overestimates only on collisions (never under).
  *
  * Bucket hashes are the engine's portable md5 derivation (seeded twin of
  * `llm.Dedup.portableWordHash`), so a SQL engine can replay the EXACT
  * counters and estimates — the gate hash-matches values, not just shapes.
  */
class CountMin(d: Int, w: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  require(d >= 1 && w >= 1)

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
    var i = 0
    while (i < d) { buf(i * w + buckets(i)) += 1L; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Weighted count-min: one input row carries a pre-aggregated key COUNT
  * (buckets, n) and increments each hash row by n — the counters are
  * IDENTICAL to feeding n raw rows through [[CountMin]], so a sketch can be
  * built from a key-domain aggregation instead of a second scan of the
  * data. This is what lets a join profiler fold (rows, max per-key count)
  * and the sketch into ONE aggregation job per side. */
class CountMinWeighted(d: Int, w: Int)
    extends Aggregator[(Seq[Int], Long), Array[Long], Seq[Long]] {
  require(d >= 1 && w >= 1)

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], in: (Seq[Int], Long)): Array[Long] = {
    val (buckets, n) = in
    var i = 0
    while (i < d) { buf(i * w + buckets(i)) += n; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  /** Portable bucket for hash row `i` (i < 4): ONE md5 per key supplies all
    * four rows — row i takes hex chars [8i+1, 8i+8] (independent 32-bit
    * chunks of the digest) → mod w. DuckDB twin:
    * `CAST('0x' || substring(md5(key), 8*i+1, 8) AS BIGINT) % w`. */
  def bucket(i: Int, key: Column, w: Int): Column = {
    require(i < 4, s"md5 supplies 4 chunk rows, got row $i")
    pmod(conv(substring(md5(key.cast(StringType)), i * 8 + 1, 8), 16, 10)
      .cast("long"), lit(w.toLong)).cast("int")
  }

  /** All d buckets for a key, as the array the Aggregator consumes —
    * ONE native digest + d unsigned-int chunk reads ([[Md5Buckets]]),
    * bit-identical per row to the legacy conv(substring(md5)) chain
    * above (Md5BucketsSpec pins it), so every DuckDB oracle twin stays
    * valid. The legacy form shared the digest via codegen subexpression
    * elimination but still paid hex encode + substring + radix parse
    * per hash row per key. */
  def buckets(key: Column, d: Int, w: Int): Column = {
    require(d <= 4, s"one md5 digest supplies at most 4 hash rows, got d=$d")
    org.apache.spark.sql.graftx.Bridge.column(
      Md5Buckets(org.apache.spark.sql.graftx.Bridge.expression(
        key.cast(StringType)), d, w))
  }

  /** Sketch an entire keys column into one d×w counter row. */
  def sketch(df: DataFrame, key: Column, d: Int, w: Int): DataFrame =
    df.select(buckets(key, d, w).as("__cms_buckets"))
      .agg(udaf(new CountMin(d, w)).apply(col("__cms_buckets")).as("cms"))

  /** Point estimate for `key` against a `cms` counters column (the one-row
    * sketch crossJoin/broadcast onto the candidates): min over hash rows. */
  def estimate(cms: Column, key: Column, d: Int, w: Int): Column =
    least((0 until d).map(i =>
      element_at(cms, bucket(i, key, w) + lit(i * w) + 1)): _*)

  /** Equi-join SIZE estimate from two sketches (AGMS/CMS inner product):
    * per hash row, Σ_bucket a[i][b]·b[i][b] upper-bounds Σ_key n_a·n_b
    * (collisions only inflate); min over the d rows tightens it. Two 2 KB
    * sketches answer "how big would this join be" WITHOUT running it —
    * the planner-side guard that decides broadcast vs shuffle vs
    * JoinGuard capping at 100 TB. */
  def innerProduct(a: Column, b: Column, d: Int, w: Int): Column =
    least((0 until d).map { i =>
      aggregate(
        zip_with(slice(a, i * w + 1, w), slice(b, i * w + 1, w),
          (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }: _*)
}
