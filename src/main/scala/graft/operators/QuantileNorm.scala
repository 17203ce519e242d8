package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization (the batch-effect correction step
  * of mixed-corpus curation): a raw quality signal (length, a classifier
  * score) is NOT comparable across sources — one crawl's median length is
  * another's p95. Mapping each row's WITHIN-SOURCE percentile onto the
  * GLOBAL distribution's value at that percentile puts every source on
  * one scale, so a single global threshold curates fairly (the
  * quantile-normalization standard from the microarray literature,
  * Bolstad et al. 2003 — public method).
  *
  * Scale shape — no global window anywhere:
  *  - within-source percentile: one source-partitioned rank window
  *    (percent_rank, ties broken by id for determinism);
  *  - the global distribution is compressed to B+1 equi-spaced quantile
  *    BREAKPOINTS built from the VALUE histogram: one map-side-combinable
  *    groupBy(value) count, a cumulative window over the |distinct
  *    values| rows (bounded-domain metadata, never row-count), and a
  *    breakpoint = min value whose cumulative fraction reaches j/B;
  *  - rows map to breakpoints by an EQUI-join on j = floor(p·B)
  *    (broadcast, B+1 rows).
  * Everything is rank/count arithmetic — replays exactly in SQL. */
object QuantileNorm {

  /** Adds `norm`: the global value at this row's within-`groupCol`
    * percentile, quantized to B equi-spaced breakpoints. `valueCol` must
    * be numeric; `idCol` breaks rank ties deterministically. */
  def normalize(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, b: Int = 64): DataFrame = {
    require(b >= 2, s"breakpoint count b must be >= 2 (got $b)")
    val wSrc = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val withP = df.withColumn("__p", percent_rank().over(wSrc))
    val tot = df.agg(count(lit(1)).cast("double").as("__n"))
    val wCdf = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCdf))
      .crossJoin(broadcast(tot))
      .withColumn("__frac", col("__cum") / col("__n"))
    val grid = df.sparkSession.range(0, b + 1)
      .select(col("id").cast("int").as("__j"))
    val bps = grid.join(cdf,
        col("__frac") >= col("__j").cast("double") / b, "left")
      .groupBy("__j").agg(min(col(valueCol)).as("__bp"))
    withP
      .withColumn("__j",
        least(floor(col("__p") * b).cast("int"), lit(b)))
      .join(broadcast(bps), "__j")
      .withColumn("norm", col("__bp"))
      .drop("__p", "__j", "__bp")
  }
}
