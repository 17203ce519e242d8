package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/validation/test splitting for training corpora (SURVEY §2D).
  *
  * The failure mode this exists to prevent: a random PER-ROW split puts
  * near-identical documents on both sides of the train/eval boundary, and
  * the eval set silently measures memorization (the dedup papers'
  * canonical leakage bug). The fix is GROUP-AWARE assignment: hash the
  * duplicate-group identity, not the row, so every member of a group
  * lands in the same split by construction.
  *
  * Scale shape: a pure per-row projection — the group key is already on
  * the row (a text hash, a dedup cluster label from D30/D119, a source
  * domain), so assignment adds ZERO shuffles and composes with any
  * upstream. Determinism: the split is a function of the group key alone
  * (md5-derived [[Dedup.portableHash60]] bucket in 0..99), reproducible
  * across runs, engines, and partitionings — no RNG state, no seed file.
  */
object Splits {

  /** Append a `split` column chosen by the group key's hash bucket.
    * `cuts` are (name, percent) with percents summing to 100; group
    * buckets 0..99 are carved in order (e.g. train 80 / val 10 / test 10
    * → buckets 0-79, 80-89, 90-99). */
  def byGroupHash(df: DataFrame, groupKey: Column,
      cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.map(_._2).sum == 100,
      s"split percents must sum to 100 (got ${cuts.map(_._2).sum})")
    val bucket = Dedup.portableHash60(groupKey) % 100
    val bounds = cuts.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val split = cuts.zip(bounds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) =>
        coalesce(acc, when(bucket < hi, lit(name)))
    }
    df.withColumn("split", split)
  }
}
