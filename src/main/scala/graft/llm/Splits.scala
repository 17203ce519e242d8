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

  /** Distribution-matched sampling (SURVEY §2D, D223): draw a sample
    * whose BUCKETED profile of some numeric property matches per-bucket
    * `quotas` — the "length-matched subset" move (match an eval set's
    * token-length distribution, a reference corpus's domain mix) that
    * per-row uniform sampling cannot express. Within a bucket the kept
    * rows are the `quota` smallest by the portable id-hash order
    * (deterministic "random", bit-replayable); a bucket with fewer rows
    * than its quota keeps everything; buckets absent from `quotas`
    * contribute nothing.
    *
    * Scale shape: the D213 two-stage quota discipline — a BottomK heap
    * pre-filter at max(quota) bounds the shuffle to k rows per (map
    * partition, bucket) even when one bucket holds most of the corpus
    * (the exact skew that motivates length matching: web text piles up
    * in two or three length bins), then the exact rank window runs over
    * ≤ k·partitions survivors and the per-bucket quota filter lands on
    * a broadcast map. The heap path needs INTEGRAL ids (BottomK's
    * primitive-long heap, the D112/D213 contract) — a non-integral id
    * column falls back to the exact single-window plan (documented as
    * not skew-hardened) instead of casting to long, which would turn
    * string ids into nulls and corrupt the hash order silently.
    * Returns (id, bucket, rank), rank 1..quota(bucket). */
  def matchedSample(df: DataFrame, idCol: String, bucketCol: Column,
      quotas: Map[Long, Long]): DataFrame = {
    require(quotas.nonEmpty && quotas.values.forall(_ >= 1),
      "quotas must be non-empty with positive caps")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType}
    import spark.implicits._
    val kMax = quotas.values.max.toInt
    val integralId = df.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    // the hash keys on the id AS A LONG on the heap path (bit-replayable
    // in SQL) and on the id's string form on the fallback — never a
    // lossy cast: a string id cast to long is null, which would corrupt
    // the hash order silently
    val idExpr =
      if (integralId) col(idCol).cast("long").as("id")
      else col(idCol).as("id")
    val hashed = df
      .select(idExpr, bucketCol.as("bucket"))
      .join(broadcast(quotas.toSeq.toDF("bucket", "__q")), "bucket")
      .withColumn("__h", Dedup.portableWordHash(col("id")))
    val survivors =
      if (!integralId) hashed
      else hashed.groupBy("bucket", "__q")
        .agg(graft.functions.BottomK.bottomk(col("id"), col("__h"), kMax)
          .as("__keep"))
        .select(col("bucket"), col("__q"), explode(col("__keep")).as("r"))
        .select(col("r.id").as("id"), col("bucket"), col("__q"),
          col("r.v").as("__h"))
    val w = Window.partitionBy("bucket")
      .orderBy(col("__h").asc, col("id").asc)
    survivors.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= col("__q"))
      .select(col("id"), col("bucket"), col("rank"))
  }
}
