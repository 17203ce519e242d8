package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval join (SURVEY §2D, D239) — the range-join
  * shape (`p.t BETWEEN i.s AND i.e`) that open-source Spark plans as a
  * broadcast-nested-loop or a cartesian-with-filter: quadratic the
  * moment neither side broadcasts. The standard fix (the Databricks
  * range-join optimization, published as "binned range join") is an
  * EQUI-join both engines shuffle-partition: each interval explodes to
  * the fixed-width bins it covers, each point maps to its one bin, the
  * join runs on (keys..., bin) and the exact BETWEEN filter keeps only
  * true matches.
  *
  * No dedup pass is needed — a (point, interval) pair can only meet in
  * the POINT's bin (the interval covers that bin exactly once), so the
  * equi-join emits each match exactly once. That keeps this a pure
  * map-explode + one shuffled equi-join: partial aggregation above it
  * stays map-side-combinable and AQE handles residual bin skew.
  *
  * Cost shape: the explode factor is ⌈interval length / binWidth⌉ + 1,
  * so `binWidth` near the TYPICAL interval length bounds the blow-up
  * by ~2× rows while keeping bins selective — the documented tuning
  * trade. A pathological giant interval degrades to (length/width)
  * bin rows — linear in its length, never quadratic in the corpus. */
object IntervalJoin {

  /** Join `points` (at `ptCol`) to `intervals` ([`sCol`, `eCol`], both
    * inclusive, long dialect) sharing `keys`. Returns every matching
    * pair with all columns of both inputs (caller disambiguates names
    * beforehand). Empty `keys` = pure range join (bins only). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, sCol: String, eCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    // degenerate s > e intervals match nothing, but Spark's sequence()
    // would happily DESCEND through their bins — drop them up front
    val ib = intervals.where(col(sCol) <= col(eCol)).withColumn("__bin",
      explode(sequence(floor(col(sCol) / binWidth).cast("long"),
        floor(col(eCol) / binWidth).cast("long"))))
    val pb = points.withColumn("__bin",
      floor(col(ptCol) / binWidth).cast("long"))
    pb.join(ib, keys :+ "__bin")
      .filter(col(ptCol) >= col(sCol) && col(ptCol) <= col(eCol))
      .drop("__bin")
  }
}
