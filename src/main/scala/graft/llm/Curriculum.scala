package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Difficulty-binned curriculum interleaving (SURVEY §2D, D241) — the
  * training-order scheduler between curation and the D203 shard
  * writer: a corpus scored by difficulty (quality, length, perplexity)
  * must not feed the model long runs of one difficulty (a
  * quality-SORTED corpus is the worst case), and a plain random
  * shuffle throws the difficulty signal away. The public
  * curriculum-learning literature's practical middle ground is the
  * STRIDE schedule: sort within each difficulty bin by a stable key,
  * then give bin-element `i` (1-based) of a bin holding `n` elements
  * the schedule key `i / (n + 1)` — each bin spreads uniformly over
  * (0, 1), so EVERY prefix of the (sched_key, bin, bin_rank) order
  * carries each bin in proportion to its corpus share, to within one
  * element per bin (require()d exactly in the gate). Deterministic,
  * resumable (the key is pure arithmetic over per-bin rank), and the
  * order composes with [[Shards]] by sharding on sched_key ranges.
  *
  * Scale shape: one window per bin (rank + bin size share the same
  * partitioning — one shuffle keyed by bin), pure arithmetic after;
  * no global window anywhere — consumers SORT BY the emitted key,
  * which a 100 TB write does as a range-partitioned sort. Binning is
  * the caller's choice; [[binByThresholds]] bins by precomputed
  * cutpoints (exact percentiles at battery SF; t-digest (D45)
  * quantiles at corpus scale), a codegen'd per-row map. */
object Curriculum {

  /** Add `bin` (1..thresholds.size + 1) by cutpoint comparison: value
    * ≤ t(0) → 1, ... > t(last) → size+1. Ties at a cutpoint fall to
    * the lower bin in both engines (the `>` is strict). */
  def binByThresholds(df: DataFrame, scoreCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted,
      s"cutpoints must be sorted, got $thresholds")
    df.withColumn("bin", thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(scoreCol > t, 1).otherwise(0)
    })
  }

  /** The stride schedule over an existing `binCol`: adds `bin_rank`
    * (1-based, by `orderCol` within the bin — unique for determinism)
    * and `sched_key` = bin_rank / (bin size + 1), rounded so the SQL
    * replay hash-matches. Read order = ascending
    * (sched_key, bin, bin_rank). */
  def interleave(df: DataFrame, binCol: String, orderCol: String,
      roundDigits: Int = 9): DataFrame = {
    val byBin = Window.partitionBy(binCol)
    df.withColumn("bin_rank",
        row_number().over(byBin.orderBy(orderCol)))
      .withColumn("sched_key",
        round(col("bin_rank").cast("double") /
          (count(lit(1)).over(byBin) + 1), roundDigits))
  }
}
