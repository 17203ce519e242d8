package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referentially-closed dev sampling (SURVEY §2D, D179): "give me 1% of
  * production that still JOINS". A per-table row sample breaks every
  * foreign key (a sampled order's customer is usually NOT sampled); the
  * correct unit is the ROOT ENTITY — sample the root's key domain by
  * deterministic hash, then take each child table by key CONTAINMENT, so
  * the extract is closed under the declared join paths and any query
  * that runs on production runs on the sample.
  *
  * The hash is the engine's portable 60-bit md5 derivation (the LSH/
  * sampling discipline): same key + same salt ⇒ same verdict in every
  * engine and every run, so samples are REPRODUCIBLE and two tables
  * sampled independently on the same root key agree without
  * coordination. Scale shape: the root filter is a pure projection;
  * each child is ONE semi-join against the sampled parent keys (both
  * sides hash-partition on the key; AQE broadcasts when the sampled key
  * domain is small enough). */
object LinkedSample {

  /** Deterministic keep-verdict for a key under (rate, salt). */
  def keep(key: Column, rate: Double, salt: String): Column = {
    require(rate > 0 && rate <= 1, s"rate must be in (0,1], got $rate")
    graft.llm.Dedup.portableHash60(
      concat(key.cast("string"), lit("|" + salt)))
      .cast("double") / lit(1152921504606846976.0) < rate // 2^60
  }

  /** Sample the ROOT table by its key. */
  def root(df: DataFrame, keyCol: String, rate: Double,
      salt: String): DataFrame =
    df.filter(keep(col(keyCol), rate, salt))

  /** A child table restricted to rows whose fk exists in the sampled
    * parent — ONE semi-join; chain for grandchildren. */
  def linked(child: DataFrame, fkCol: String, sampledParent: DataFrame,
      parentKeyCol: String): DataFrame =
    child.join(
      sampledParent.select(col(parentKeyCol).as("__pk")).distinct(),
      child(fkCol) === col("__pk"), "left_semi")

  /** EXACT-k per-group sample (D181): exactly min(k, |group|) rows per
    * group, chosen by hash RANK — uniform without replacement,
    * reproducible, and engine-portable (row_number over the portable
    * hash, id tiebreak). The eval-set constructor: "exactly 100 docs per
    * source" — fraction-based stratified sampling (D62) can only promise
    * k in expectation. One window over a (group, hash) sort — the same
    * shuffle shape as any per-group top-k. */
  def perGroupExact(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = graft.llm.Dedup.portableHash60(
      concat(col(idCol).cast("string"), lit("|" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k).drop("__r")
  }
}
