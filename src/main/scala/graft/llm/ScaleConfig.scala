package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Budget-driven cap derivation (SURVEY §2D, r13) for the bucketed
  * candidate generators — D202/D206's `bucketCap` and D58's `nlist`
  * stop being hand-tuned constants a 100 TB run must guess and become
  * DEFAULTS a deployment can derive from a declared pair budget plus
  * ONE measured count aggregation.
  *
  * The D202 derivation works on the MEASURED (table, bucket) histogram:
  * the candidate cost of cap `c` is Σ_b m·(m−1) with m = min(n_b, c) —
  * exactly the pair count the within-bucket self-join materializes —
  * and [[bucketCapFor]] returns the largest cap whose measured cost
  * fits the budget, clamped to the largest bucket (beyond which a
  * bigger cap changes nothing). Every per-bucket term is monotone in
  * `c`, so equal TOTAL cost forces equal per-bucket member counts; cap
  * admission is deterministic by smallest id, so equal counts mean the
  * IDENTICAL membership frame — which is how the gate pins that the
  * derived cap reproduces today's constant's behavior bit-for-bit at
  * battery SFs.
  *
  * The D58 derivation is the uniform-shard model: `nlist` clusters of
  * ~n/nlist vectors pair within clusters at ~n²/nlist total, so the
  * smallest power-of-two `nlist` with n²/nlist ≤ budget fits (powers
  * of two because the IVF coarse quantizer's cost/recall trade moves
  * in octaves — the conventional grid). Real clusters skew, so D58
  * additionally caps with `Dedup.cappedBuckets` when skew matters —
  * this derivation sizes the GRID, the cap bounds the TAIL.
  *
  * Cost shape: [[bucketHistogram]] is one map-side-combinable count
  * aggregation collected driver-side — ≤ tables·2^planes rows,
  * catalog-sized at any corpus size. The searches are driver-side
  * folds over that histogram. */
object ScaleConfig {

  /** Sentinel cap value: "derive from the measured histogram". The
    * bucketed generators (D2/D3/D58/D202) default their cap parameters
    * to this, so a cap-LESS call measures its own bucket histogram and
    * derives the largest cap that fits [[DefaultPairBudget]] — fixed
    * constants become explicit overrides instead of the default a
    * 100 TB run must remember to change. */
  val Auto: Int = -1

  /** Default per-call candidate-pair budget for [[Auto]] derivation.
    * Generous at battery SFs — there the derived cap clamps to the
    * largest bucket, capping is a no-op and behavior matches today's
    * constants (gate-pinned) — while still a real quadratic bound at
    * corpus scale. */
  val DefaultPairBudget: Long = 64L * 1000 * 1000

  /** Per-(table, bucket) member counts for the D202 generator — ONE
    * count aggregation over the shared bucketing expressions. */
  def bucketHistogram(df: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Double]]]): Seq[Long] =
    Similarity.signBuckets(df, idCol, vecCol, tables)
      .groupBy("tbl", "bucket").agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0)).toSeq

  /** Measure an arbitrary bucketed frame's histogram (one map-side-
    * combinable count aggregation over `keys`, collected driver-side —
    * buckets-sized, never data-sized) and derive its cap. An EMPTY
    * frame derives the minimum cap 2: nothing can pair either way. */
  def deriveCap(bucketed: DataFrame, keys: Seq[String],
      pairBudget: Long = DefaultPairBudget): Int = {
    val hist = bucketed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0)).toSeq
    if (hist.isEmpty) 2 else bucketCapFor(hist, pairBudget)
  }

  /** The within-bucket candidate-pair cost of cap `c` under measured
    * histogram `hist`: Σ_b min(n_b, c)·(min(n_b, c)−1). SATURATING at
    * Long.MaxValue — at the histogram sizes this targets a naive sum
    * wraps negative, which would break the monotonicity the binary
    * search in [[bucketCapFor]] depends on and silently derive a cap
    * far over budget; saturation preserves monotone order. */
  def pairCost(hist: Seq[Long], c: Int): Long =
    hist.foldLeft(0L) { (acc, n) =>
      val m = math.min(n, c.toLong)
      val term =
        try math.multiplyExact(m, m - 1)
        catch { case _: ArithmeticException => Long.MaxValue }
      try math.addExact(acc, term)
      catch { case _: ArithmeticException => Long.MaxValue }
    }

  /** Largest cap whose measured pair cost fits `pairBudget`, clamped to
    * [2, largest bucket]: raising the cap past the largest bucket
    * spends nothing more, so the clamp makes the answer the EFFECTIVE
    * cap (and keeps the derivation stable when no bucket saturates).
    * Budgets below the cost of cap 2 refuse — a generator that cannot
    * pair is a config error, not a silent empty graph. */
  def bucketCapFor(hist: Seq[Long], pairBudget: Long): Int = {
    require(hist.nonEmpty, "empty histogram — measure before deriving")
    require(pairCost(hist, 2) <= pairBudget,
      s"pair budget $pairBudget below the cost of the minimum cap 2 " +
        s"(${pairCost(hist, 2)}) — nothing could pair")
    val ceil = math.min(hist.max, Int.MaxValue.toLong).toInt
    if (ceil <= 2) return 2
    // cost is nondecreasing in c: binary-search the largest fit
    var lo = 2
    var hi = ceil
    while (lo < hi) {
      val mid = lo + (hi - lo + 1) / 2
      if (pairCost(hist, mid) <= pairBudget) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Smallest power-of-two `nlist` whose uniform-shard pair cost
    * n²/nlist fits `pairBudget` (≥ `floor`, the quantizer's minimum
    * useful grid). n² is computed in BigInt — at the corpus sizes this
    * derivation targets, Long n·n wraps and would silently return the
    * floor; a grid beyond 2^30 shards refuses loudly (no IVF quantizer
    * runs there — raise the budget or shard the corpus first). */
  def nlistFor(n: Long, pairBudget: Long, floor: Int = 2): Int = {
    require(n >= 0 && pairBudget >= 1 && floor >= 1)
    val need = ((BigInt(n) * BigInt(n) + pairBudget - 1) / pairBudget)
      .max(BigInt(1))
    require(need <= (BigInt(1) << 30),
      s"nlistFor(n=$n, budget=$pairBudget) needs ~$need shards — " +
        "beyond any practical IVF grid; raise the pair budget")
    var nl = floor.toLong
    while (nl < need.toLong) nl <<= 1
    nl.toInt
  }
}
