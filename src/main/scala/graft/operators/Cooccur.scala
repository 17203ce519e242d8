package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capped bipartite co-occurrence projection (SURVEY §2D, D118): project
  * (group, item) memberships onto an item–item edge list weighted by
  * co-membership count — the market-basket / co-click / co-citation graph
  * builder.
  *
  * The blowup hazard is per-group pair fan-out: one group holding n items
  * emits C(n, 2) pairs, so a single degenerate group (a crawler session
  * touching every page) detonates the projection. Groups are therefore
  * capped to their `capPerGroup` smallest items under a DETERMINISTIC
  * total order BEFORE pairing — the LSH `cappedBuckets` discipline — so
  * the exchange carries at most C(cap, 2) pairs per group and the result
  * is a pure function of the data set. Memberships dedupe first
  * (repeated (group, item) rows count once). */
object Cooccur {

  /** Item–item co-occurrence edges (i1 < i2, weight = co-group count). */
  def project(df: DataFrame, groupCol: String, itemCol: String,
      capPerGroup: Int): DataFrame = {
    require(capPerGroup >= 2, s"capPerGroup must be >= 2 (got $capPerGroup)")
    val m = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val w = Window.partitionBy("g").orderBy("i")
    val capped = m.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= capPerGroup).drop("__rn")
    capped.as("a")
      .join(capped.as("b"),
        col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("i1"), col("b.i").as("i2"))
      .agg(count(lit(1)).as("w"))
  }
}
