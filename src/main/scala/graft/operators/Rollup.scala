package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance (SURVEY §2D, D104).
  *
  * A materialized rollup (count + exact-decimal sum per key) is kept
  * current by MERGING each delta's partial aggregate into it — the 100 TB
  * base is NEVER rescanned; only the delta shuffles (map-side combined to
  * its key domain) and the merge aggregates two rollup-domain-sized
  * tables. This is the additive-state discipline Spark's own partial
  * aggregation uses, lifted to cross-batch persistence — and the same
  * algebra that makes every sketch in `graft.functions` mergeable.
  *
  * State is (n, s): both add, so merge order and batch boundaries cannot
  * change the result — `maintain(base ∪ d1 ∪ d2) ≡ merge(merge(build(
  * base), d1), d2)` exactly (decimal sums, no float drift).
  */
object Rollup {

  /** Build the rollup of `df`: exact decimal(18,2) sum + count per key. */
  def build(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast(DecimalType(18, 2))).as("s"))

  /** Merge a delta's rows into an existing rollup. */
  def merge(rollup: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    rollup.unionByName(build(delta, keys, valueCol))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))

  /** Reader-facing projection: the exact decimal internal state surfaces
    * as a double total (the engine-wide output convention, Q.dsum). */
  def readable(rollup: DataFrame): DataFrame =
    rollup.withColumn("total", col("s").cast(DoubleType)).drop("s")
}
